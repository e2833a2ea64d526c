package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextHashing._

/** Deduplication operators for a large-scale text corpus — the
  * training-data-pipeline extension of the engine (north star in
  * BASELINE.json; fixtures /root/testdata/sf* /documents.parquet).
  *
  * Scale posture: every method is bucketed/banded — candidate pairs come
  * from equality joins on shingle/band/bucket keys, never a cross join.
  * The physical plans are shuffle-on-key hash joins + hash aggregations,
  * which scale horizontally; a CartesianProduct anywhere here is a bug.
  */
object TextDedup {

  val JaccardThreshold = 0.2
  val NumHashes = 32
  val BandRows = 4 // 8 bands x 4 rows

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Exact dedup by content hash: one surviving doc_id per distinct
    * normalized text (hash-groupBy — the trivially-parallel baseline). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(lower(col("text"))).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "content_hash", "n_dups")
      .orderBy("keep_id")

  /** N-gram Jaccard near-dedup: word 3-gram shingles, inverted-index
    * self-join on shingle, exact Jaccard >= threshold. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(docs(spark, dir), JaccardThreshold)
      .orderBy("doc_a", "doc_b")

  /** MinHash signatures: 32 affine permutations h_i(x) = ((2i+1)*x' + i^2+7)
    * mod p over md5-hashed shingles (x' = x mod p). Returns one row per
    * (doc_id, band) with the band key — the LSH bucketing table. */
  private def bandTable(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(docs(spark, dir))
      .withColumn("h", md5Long(col("sh")) % P)
    sh.withColumn("i", explode(sequence(lit(0), lit(NumHashes - 1))))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(((lit(2) * col("i") + 1) * col("h") + col("i") * col("i") + 7) % P).as("mh"))
      .withColumn("band", expr(s"i div $BandRows"))
      // band key = the 4 minima in row order; (i % 4) is a single digit so
      // lexicographic sort_array reproduces row order deterministically
      .groupBy(col("doc_id"), col("band"))
      .agg(concat_ws(",", sort_array(collect_list(concat(col("i") % BandRows, lit(":"), col("mh"))))).as("band_key"))
  }

  /** MinHash-LSH near-dedup: candidates = pairs sharing any band key;
    * survivors = candidates whose exact Jaccard clears the threshold.
    * Join is on (band, band_key) — cost scales with bucket occupancy, not
    * corpus size squared. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val bt = bandTable(spark, dir)
    val cands = bt.as("a")
      .join(bt.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardPairs(docs(spark, dir), JaccardThreshold)
      .join(cands, Seq("doc_a", "doc_b")) // verify candidates exactly
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** 48-bit SimHash signatures over distinct words (md5-hashed): bit j is
    * the sign of the vote sum over words of (+1 / -1 on word-hash bit j).
    * 48 bits so the signature and all band arithmetic stay well inside
    * Long. */
  def simhashSigs(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .distinct()
      .withColumn("wh", md5Long(col("w")))
      .withColumn("j", explode(sequence(lit(0), lit(47))))
      .withColumn("vote", when(expr("shiftright(wh, cast(j as int))") % 2 === 1, 1).otherwise(-1))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") >= 0, expr("shiftleft(cast(1 as bigint), cast(j as int))")).otherwise(0L)).as("sig"))

  /** SimHash near-dup pairs: 4 bands x 12 bits; candidates share a band,
    * survivors have Hamming distance <= 6 over the 48-bit signatures. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = simhashSigs(spark, dir)
    val bands = sigs.withColumn("b", explode(sequence(lit(0), lit(3))))
      .withColumn("band_val", expr("shiftright(sig, cast(b * 12 as int))") % 4096)
    val cands = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.band_val") === col("y.band_val")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.sig").as("sig_a"),
        col("y.doc_id").as("doc_b"), col("y.sig").as("sig_b"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= 6)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
