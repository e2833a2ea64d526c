package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextHashing.words

/** Keyword relevance ranking (BM25) and hybrid text+vector retrieval
  * (reciprocal-rank fusion) over the documents/embeddings tables — the
  * retrieval surface a training-data pipeline needs for "find documents
  * like this one" curation, decontamination triage, and quality-weighted
  * sampling.
  *
  * Robertson/Spärck Jones BM25 (the Okapi formulation, public-domain
  * formula): score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
  * with the always-positive idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Architecture is inverted-index-shaped, not scan-shaped:
  *  - `postings` (doc_id, term, tf, dl) is the inverted index, built once
  *    per (session, dir) and session-cached; at 100 TB this is a persisted
  *    table partitioned/bucketed by term so a query's term filter prunes
  *    to the touched posting lists instead of scanning the corpus.
  *  - `dfTable` (term, df) is the index's lexicon — tiny (vocabulary-sized),
  *    always broadcast.
  *  - A query probes the index with an equality filter/join on its terms;
  *    cost is the touched posting lists, the single shuffle is the per-doc
  *    score sum (groupBy doc_id), and the top-k is a TakeOrderedAndProject.
  *
  * Determinism across engines (the DuckDB oracle): each per-(doc, term)
  * contribution is rounded to 6 decimals and cast to DECIMAL(18,6) BEFORE
  * the sum, so the aggregation is exact and addition-order-free — a double
  * sum's value would depend on shuffle arrival order. The final score is
  * the decimal sum cast back to double.
  */
object TextRanking {

  val K1 = 1.2
  val B = 0.75
  /** The standard RRF dampening constant (Cormack et al.). */
  val RrfK = 60

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** The inverted index: one row per (doc, term) with the term frequency
    * and the document length (denormalized onto every posting so scoring
    * needs no second join). Session-cached; if documents.parquet is
    * rewritten mid-session call
    * `SessionCache.invalidate(spark, "bm25_postings", dir)`. */
  def postings(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "bm25_postings", dir) {
      val wrd = docs(spark, dir)
        .select(col("doc_id"), words(col("text")).as("ws"))
      val dl = wrd.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
      wrd
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
        .join(dl, "doc_id")
        .select("doc_id", "term", "tf", "dl")
    }

  /** The lexicon: document frequency per term. Vocabulary-sized, so the
    * planner broadcasts it wherever it joins. */
  def dfTable(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "bm25_df", dir) {
      postings(spark, dir).groupBy("term").agg(count(lit(1)).as("df"))
    }

  /** (N, avgdl) — two scalars per (session, dir), memoized on the driver
    * (same pattern as Similarity's kind cache). N counts ALL documents,
    * including zero-token ones; avgdl averages over all documents. */
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (Long, Double)]()

  graft.core.SessionCache.onSessionEnd { spark =>
    val it = statsCache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }

  def corpusStats(spark: SparkSession, dir: String): (Long, Double) = {
    graft.core.SessionCache.watch(spark)
    statsCache.computeIfAbsent((spark, dir), { _ =>
      val row = docs(spark, dir)
        .select(size(words(col("text"))).cast("long").as("dl"))
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
        .head()
      val n = row.getLong(0)
      (n, row.getLong(1).toDouble / n)
    })
  }

  /** The BM25 per-(doc, term) contribution, rounded and cast to decimal so
    * the downstream sum is exact (see class note). Expects columns tf, dl,
    * df on the input row. */
  private def contribution(n: Long, avgdl: Double): Column = {
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sat = col("tf") * lit(K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl)))
    round(idf * sat, 6).cast("decimal(18,6)")
  }

  /** Top-k documents for one keyword query. The probe is an IN-filter on
    * the postings index (at scale: partition pruning on the term key), the
    * lexicon join broadcasts, and the only shuffle is the per-doc sum. */
  def bm25TopK(spark: SparkSession, dir: String, terms: Seq[String], k: Int): DataFrame = {
    val (n, avgdl) = corpusStats(spark, dir)
    val q = terms.distinct
    postings(spark, dir)
      .filter(col("term").isin(q: _*))
      .join(broadcast(dfTable(spark, dir).filter(col("term").isin(q: _*))), "term")
      .select(col("doc_id"), contribution(n, avgdl).as("w"))
      .groupBy("doc_id")
      .agg(sum("w").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-query keyword sets for "more like this doc" retrieval: each query
    * document's `nTerms` highest-tf terms (term-asc tie-break). Derived
    * from the same postings index — no extra corpus scan. */
  def queryTermsOf(spark: SparkSession, dir: String,
                   qids: Seq[Long], nTerms: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term").asc)
    postings(spark, dir)
      .filter(col("doc_id").isin(qids: _*))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nTerms)
      .select(col("doc_id").as("qid"), col("term"))
  }

  /** Multi-query BM25: top-k per query document (query docs excluded from
    * their own result, like the ANN operators). Returns
    * (qid, doc_id, score, bm_rank). */
  def bm25TopKFor(spark: SparkSession, dir: String, qids: Seq[Long],
                  k: Int, nTerms: Int = 3): DataFrame = {
    val (n, avgdl) = corpusStats(spark, dir)
    val qt = queryTermsOf(spark, dir, qids, nTerms)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    postings(spark, dir)
      .join(broadcast(qt), "term")
      .filter(col("doc_id") =!= col("qid"))
      .join(broadcast(dfTable(spark, dir)), "term")
      .select(col("qid"), col("doc_id"), contribution(n, avgdl).as("w"))
      .groupBy("qid", "doc_id")
      .agg(sum("w").cast("double").as("score"))
      .withColumn("bm_rank", row_number().over(w).cast("long"))
      .filter(col("bm_rank") <= k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 rank list and
    * the exact-cosine vector rank list for the same query documents
    * (doc_id and vec_id are the same id space). rrf(d) =
    * Σ_lists 1/(60 + rank_list(d)), absent-from-list contributing 0 —
    * Cormack/Clarke/Büttcher's parameter-free fusion. Contributions are
    * rounded+decimal-summed like BM25 scores, so ties are exact and the
    * doc_id tie-break total.
    *
    * Plan shape: two rank lists of kEach rows per query (tiny), fused with
    * a full outer join on (qid, doc_id) — both sides are already top-k
    * outputs, so fusion cost is negligible next to the probes. */
  def hybridRrfTopK(spark: SparkSession, dir: String, qids: Seq[Long],
                    k: Int, kEach: Int = 20, nTerms: Int = 3): DataFrame = {
    val bm = bm25TopKFor(spark, dir, qids, kEach, nTerms)
      .select(col("qid"), col("doc_id"), col("bm_rank"))
    val annW = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    val ann = Similarity.bruteForceTopKFor(spark, dir, qids, kEach)
      .withColumn("ann_rank", row_number().over(annW))
      .select(col("qid"), col("vec_id").as("doc_id"), col("ann_rank"))
    val rrfPart = (r: Column) =>
      coalesce(round(lit(1.0) / (lit(RrfK) + r), 6).cast("decimal(18,6)"),
        lit(BigDecimal(0)).cast("decimal(18,6)"))
    val w = Window.partitionBy("qid").orderBy(col("rrf_score").desc, col("doc_id").asc)
    bm.join(ann, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"),
        (rrfPart(col("bm_rank")) + rrfPart(col("ann_rank"))).cast("double").as("rrf_score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "doc_id", "rrf_score")
      .orderBy(col("qid"), col("rrf_score").desc, col("doc_id"))
  }
}
