package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Scalar quantization (SQ8) for the ANN family: each dimension is
  * quantized independently to an 8-bit code against per-dimension
  * [min, max] trained from the corpus — the classical "SQ" layout
  * (FAISS's ScalarQuantizer, Lucene's int8 HNSW vectors are the same
  * public idea). Complements PQ: 4x compression instead of 128x, but
  * near-exact recall and no codebook k-means — training is one min/max
  * aggregation pass.
  *
  * Search is asymmetric (ADC-style): the query stays full-precision and
  * candidates are decoded from their codes on the fly — decode is a
  * codegen'd `transform` against two 64-element literal arrays (dim-bound,
  * NOT corpus- or k-bound), so the probe plan shape is constant.
  *
  * Scale posture: the codes table is the index — 64 B/vector instead of
  * 256 B, so a full-scan probe reads 4x less than brute force at the same
  * exactness class. At 100 TB SQ is the rerank-friendly middle rung:
  * IVF/IVF-PQ prune partitions, SQ serves high-recall shortlists where PQ's
  * 32-bit codes are too coarse. Train/encode once at ingest
  * (`buildSqIndex`), probe from any cold session with zero training.
  *
  * Persistence follows the family's marker convention: codes are written
  * FIRST, the min/max file LAST (the commit marker) — a crash mid-build
  * leaves no marker and readers re-derive in-session, never trusting
  * partial codes.
  */
object ScalarQuant {

  val Dim = 64
  val Levels = 255.0

  def sqCodesPath(dir: String): String = s"$dir/sq_codes.parquet"
  def sqMinMaxPath(dir: String): String = s"$dir/sq_minmax.parquet"

  /** Diagnostic counter (spec: cold sessions with a persisted index must
    * not re-train). */
  private[graft] val trainRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  private def exists(spark: SparkSession, path: String): Boolean =
    graft.core.Fs.exists(spark, path)

  private def deletePath(spark: SparkSession, path: String): Unit =
    graft.core.Fs.delete(spark, path)

  /** Per-dimension (min, max) — the whole "codebook" (128 doubles on the
    * driver). Persisted-first: doubles round-trip parquet losslessly, so
    * a cold session decodes bit-for-bit what the training session
    * encoded. Min/max are order-free aggregates, so the in-session
    * derivation is deterministic too. */
  private val mmCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (Seq[Double], Seq[Double])]()

  def minMaxOf(spark: SparkSession, dir: String): (Seq[Double], Seq[Double]) = {
    graft.core.SessionCache.watch(spark)
    mmCache.computeIfAbsent((spark, dir), { _ =>
      if (exists(spark, sqMinMaxPath(dir))) {
        val r = spark.read.parquet(sqMinMaxPath(dir)).select("mn", "mx").head()
        (r.getSeq[Double](0).toSeq, r.getSeq[Double](1).toSeq)
      } else trainMinMax(spark, dir)
    })
  }

  private def trainMinMax(spark: SparkSession, dir: String): (Seq[Double], Seq[Double]) = {
    trainRuns.incrementAndGet()
    val aggs = (1 to Dim).map(i => min(element_at(col("v"), i)).as(s"mn$i")) ++
      (1 to Dim).map(i => max(element_at(col("v"), i)).as(s"mx$i"))
    val r = Similarity.emb(spark, dir).agg(aggs.head, aggs.tail: _*).head()
    ((0 until Dim).map(r.getDouble), (Dim until 2 * Dim).map(r.getDouble))
  }

  /** The 8-bit encode column: code_d = min(255, floor((v_d - mn_d)·255/(mx_d - mn_d) + 0.5)),
    * constant dims code as 0. One codegen'd transform per row. */
  def encodeCol(mn: Seq[Double], mx: Seq[Double], vcol: Column = col("v")): Column = {
    val mnL = typedLit(mn); val mxL = typedLit(mx)
    transform(vcol, (x, i) => {
      val lo = element_at(mnL, i + 1); val hi = element_at(mxL, i + 1)
      when(hi === lo, lit(0.0))
        .otherwise(least(lit(Levels), floor(((x - lo) * lit(Levels)) / (hi - lo) + lit(0.5))))
        .cast("int")
    })
  }

  /** The decode column: v̂_d = mn_d + (code_d·(mx_d - mn_d))/255 — the
    * reconstruction the oracle mirrors digit for digit. */
  def decodeCol(mn: Seq[Double], mx: Seq[Double], codes: Column): Column = {
    val mnL = typedLit(mn); val mxL = typedLit(mx)
    transform(codes, (c, i) => {
      val lo = element_at(mnL, i + 1); val hi = element_at(mxL, i + 1)
      lo + (c.cast("double") * (hi - lo)) / lit(Levels)
    })
  }

  /** The codes table (vec_id, codes). Persisted-first, else derived from
    * the corpus and session-cached ("sq_codes"). */
  def sqCodes(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "sq_codes", dir) {
      if (exists(spark, sqMinMaxPath(dir)) && exists(spark, sqCodesPath(dir)))
        spark.read.parquet(sqCodesPath(dir)).select("vec_id", "codes")
      else {
        val (mn, mx) = minMaxOf(spark, dir)
        Similarity.emb(spark, dir).select(col("vec_id"), encodeCol(mn, mx).as("codes"))
      }
    }

  /** Train + persist the SQ index at `at` (default: alongside the corpus).
    * Codes first, min/max (the marker) last. */
  def buildSqIndex(spark: SparkSession, dir: String, at: Option[String] = None): Unit = {
    val target = at.getOrElse(dir)
    deletePath(spark, sqMinMaxPath(target)) // drop the marker before touching codes
    val (mn, mx) = minMaxOf(spark, dir)
    Similarity.emb(spark, dir)
      .select(col("vec_id"), encodeCol(mn, mx).as("codes"))
      .write.mode("overwrite").parquet(sqCodesPath(target))
    import spark.implicits._
    Seq((mn, mx)).toDF("mn", "mx").coalesce(1)
      .write.mode("overwrite").parquet(sqMinMaxPath(target))
    invalidateSq(spark, target)
  }

  /** Drop the session's view of a (possibly rebuilt) SQ index. */
  def invalidateSq(spark: SparkSession, dir: String): Unit = {
    mmCache.remove((spark, dir))
    graft.core.SessionCache.invalidate(spark, "sq_codes", dir)
  }

  graft.core.SessionCache.onSessionEnd { spark =>
    val it = mmCache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }

  /** ADC scores for a query set: decode each candidate's codes, cosine
    * against the full-precision query. The query side broadcasts; the
    * only scan is the (4x-compressed) codes table. */
  private def adcScores(spark: SparkSession, dir: String, qids: Seq[Long]): DataFrame = {
    val (mn, mx) = minMaxOf(spark, dir)
    val e = Similarity.emb(spark, dir)
    val q = e.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val vhat = decodeCol(mn, mx, col("codes"))
    sqCodes(spark, dir)
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("vhat", vhat)
      .withColumn("approx_sim",
        round(GraftExtensions.dot(col("qv"), col("vhat")) /
          (sqrt(GraftExtensions.dot(col("vhat"), col("vhat"))) * col("qnrm")), 6))
      .select("qid", "vec_id", "approx_sim")
  }

  /** Top-k by ADC score alone (the compressed-scan rung). */
  def sqTopKFor(spark: SparkSession, dir: String, qids: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("approx_sim").desc, col("vec_id").asc)
    adcScores(spark, dir, qids)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "vec_id", "approx_sim")
      .orderBy(col("qid"), col("approx_sim").desc, col("vec_id"))
  }

  /** ADC shortlist then exact rerank from the stored vectors — output
    * similarities are EXACT (same contract as pqTopKReranked). */
  def sqTopKReranked(spark: SparkSession, dir: String, qids: Seq[Long],
                     k: Int, shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("approx_sim").desc, col("vec_id").asc)
    val sl = adcScores(spark, dir, qids)
      .withColumn("srn", row_number().over(w)).filter(col("srn") <= shortlist)
      .select("qid", "vec_id")
    val e = Similarity.emb(spark, dir)
    val q = e.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val w2 = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    sl.join(q, "qid")
      .join(e.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .withColumn("cos_sim",
        round(Similarity.cosineWithNorms(col("qv"), col("v"), col("qnrm"), col("nrm")), 6))
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select("qid", "vec_id", "cos_sim")
      .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
  }

  /** Fixed-query wrappers for the oracle gate. */
  def sqTopK(spark: SparkSession, dir: String): DataFrame =
    sqTopKFor(spark, dir, Similarity.QueryIds.map(_.toLong), 5)

  def sqRerank(spark: SparkSession, dir: String): DataFrame =
    sqTopKReranked(spark, dir, Similarity.QueryIds.map(_.toLong), 5, 20)
}
