package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextHashing.{md5Long, words}

/** Hashed n-gram importance scoring for data selection — the
  * importance-resampling recipe of DSIR (Xie et al., 2023, "Data
  * Selection for Language Models via Importance Resampling") with the
  * Gumbel draw replaced by a deterministic top-k rank so the DuckDB
  * oracle can pin the exact selected set.
  *
  * Recipe: fit two bag-of-hashed-ngrams unigram models — one on a small
  * TARGET domain (here the deterministic doc_id % 7 == 0 slice standing
  * in for "high-quality target corpus"), one on the RAW pool (the rest).
  * Each raw document scores the sum over its unigram+bigram feature
  * occurrences of log(p_target(bucket) / p_raw(bucket)) with add-one
  * smoothing; the top-k raw docs by that log importance weight are the
  * selected training subset.
  *
  * Cross-engine determinism (ORACLE.md): the per-bucket log ratio is
  * computed from exact integer counts as ONE double expression, rounded
  * to 6 decimals and cast DECIMAL(18,6) (the BM25 convention), so the
  * per-doc sum is exact and addition-order-free; ranking is on that
  * exact decimal with a doc_id tie-break. The bucket count B and both
  * corpus totals are data-derived by each engine from the same input —
  * never collected on one side and pasted into the other.
  *
  * Plan shape (100 TB posture): one corpus-token-proportional shuffle
  * builds the B-bucket count table (B = 4096 rows — partial aggregation
  * does the heavy lifting map-side); the weight table then BROADCASTS
  * back onto the feature stream, and the per-doc sum is a second
  * token-proportional aggregate. Nothing corpus-sized sits per
  * partition; the model itself is O(B), the whole point of hashed DSIR.
  */
object Importance {

  /** Feature-hash buckets. DSIR uses 10^4; 4096 keeps the bucket table
    * broadcast-trivial while leaving ~2 docs/bucket collisions at sf0.1
    * (collision noise is part of the recipe — both engines hash
    * identically, so it cancels under the oracle). */
  val Buckets = 4096
  val TopK = 100

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Word bigrams of a materialized words column (empty below 2 words). */
  private def bigramsOf(ws: Column): Column =
    when(size(ws) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))

  /** (doc_id, bucket) hashed unigram+bigram occurrence stream. */
  private def features(d: DataFrame, buckets: Int): DataFrame =
    d.withColumn("ws", words(col("text")))
      .select(col("doc_id"),
        explode(concat(col("ws"), bigramsOf(col("ws")))).as("f"))
      .select(col("doc_id"),
        pmod(md5Long(concat(lit("f:"), col("f"))), lit(buckets.toLong)).as("b"))

  /** Top-k raw docs by summed hashed-ngram log importance weight.
    * Output: (doc_id, n_feats, w_sum) ordered by the selection rank. */
  def importanceTopK(spark: SparkSession, dir: String,
                     buckets: Int = Buckets, k: Int = TopK): DataFrame = {
    // the narrow (doc_id, b) projection feeds BOTH the bucket-count pass
    // and the scoring pass — session-cache it so the corpus is tokenized
    // once, not twice (spills to disk if it outgrows memory; at 100 TB
    // this is the same cache-the-feature-stream trade QualityClassifier
    // makes). Keyed through SessionCache (the ivf_session_postings
    // pattern) so repeat calls in one session reuse ONE cached copy and
    // session-end eviction applies — a bare persist here accumulated a
    // duplicate corpus-sized cache entry per invocation.
    val feats = graft.core.SessionCache.getOrBuild(
        spark, s"dsir_feats_$buckets", dir) {
      features(docs(spark, dir), buckets)
    }
    val isTarget = col("doc_id") % 7 === 0
    val cnt = feats.groupBy("b").agg(
      sum(when(isTarget, 1L).otherwise(0L)).as("ct"),
      sum(when(isTarget, 0L).otherwise(1L)).as("cr"))
    // totals re-derived in-plan: the oracle computes the same scalars
    // from the same table (ORACLE.md: never paste a collected constant)
    val tot = cnt.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val bs = lit(buckets.toDouble)
    val w = cnt.crossJoin(broadcast(tot))
      .withColumn("w", round(log(
        (col("ct") + lit(1.0)) * (col("tr") + bs) /
          ((col("cr") + lit(1.0)) * (col("tt") + bs))), 6)
        .cast("decimal(18,6)"))
      .select("b", "w")
    feats.filter(!isTarget)
      .join(broadcast(w), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("w").as("wsum"))
      // rank on the double cast of the EXACT decimal sum: decimal→double
      // is monotone up to ties, and any tie falls to the doc_id
      // tie-break identically in both engines
      .select(col("doc_id"), col("n_feats"),
        col("wsum").cast("double").as("w_sum"))
      .orderBy(col("w_sum").desc, col("doc_id").asc)
      .limit(k)
  }
}
