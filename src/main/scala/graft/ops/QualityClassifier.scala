package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextHashing.md5Long

/** A trained quality classifier — the fastText-style filter every
  * published curation pipeline ends with (CCNet, RefinedWeb, FineWeb
  * train a linear classifier over hashed n-gram features to score "does
  * this look like the target domain"), here trained INSIDE the engine by
  * full-batch gradient descent so no external model artifact exists.
  *
  * Model: bias-free logistic regression over the same hashed
  * unigram+bigram presence features as `Importance` (B = 4096 buckets).
  * Labels: the deterministic target slice doc_id % 7 == 0 is the
  * positive class (stand-in for "curated reference corpus"), everything
  * else negative. Training is full-batch GD — deterministic, no shuffle
  * of example order to matter:
  *
  *   round r:  z_d = Σ_{b ∈ d} w_b            (exact DECIMAL(18,6) sum)
  *             err_d = round(y_d − σ(z_d), 6)  (one double expr per doc)
  *             w_b  += round(lr · Σ_d err_d / n, 6)
  *
  * Cross-engine determinism (ORACLE.md): weights LIVE on the 10^-6
  * decimal grid — per-doc margins and per-bucket gradients are exact
  * decimal sums (order-free), and every double step (sigmoid, the lr
  * scale, the grid round) is ONE expression over identical inputs. The
  * DuckDB oracle unrolls the same rounds as CTEs; n and the feature
  * table are re-derived by each engine from the corpus.
  *
  * Plan shape (100 TB posture): per round, ONE broadcast of the B-row
  * weight table onto the feature stream (z/err = token-proportional
  * aggregate by doc), one token-proportional aggregate by bucket for
  * the gradient — B stays driver-sized (the kmeansTrain pattern:
  * collect a model-sized table per round, never corpus-sized). Rounds
  * are few and vocab-independent; the corpus is scanned 2× per round
  * from the same cached feature projection.
  */
object QualityClassifier {

  val Buckets: Int = Importance.Buckets
  val Rounds = 3
  val LearningRate = 0.5

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Distinct (doc_id, b) presence features — binary features keep the
    * margin bounded and the oracle mirror trivial. */
  private def presenceFeatures(d: DataFrame, buckets: Int): DataFrame = {
    val ws = TextHashing.words(col("text"))
    val bigrams = when(size(col("ws")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("ws")) - 1),
        i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1))))
    d.withColumn("ws", ws)
      .select(col("doc_id"), explode(concat(col("ws"), bigrams)).as("f"))
      .select(col("doc_id"),
        pmod(md5Long(concat(lit("f:"), col("f"))), lit(buckets.toLong)).as("b"))
      .distinct()
  }

  // -- persisted model artifact --------------------------------------
  // Same family discipline as the tokenizer / text / vector indexes:
  // data first, the stats file LAST as the commit marker.

  def modelPath(dir: String): String = s"$dir/quality_model.parquet"
  /** (buckets, rounds, lr_times_1e6, n_train) — written last, the
    * commit marker. lr rides as an exact integer (x 1e6) so the marker
    * never holds a float. */
  def modelStatsPath(dir: String): String = s"$dir/quality_model_stats.parquet"

  /** Train on `dir` and persist the weight table — the train-once /
    * score-anywhere artifact for the quality filter (the tokenizer
    * recipe applied to the model): any session then scores any corpus
    * against it with zero training passes. */
  def buildModel(spark: SparkSession, dir: String, rounds: Int = Rounds,
                 lr: Double = LearningRate, buckets: Int = Buckets,
                 at: Option[String] = None): Unit = {
    import spark.implicits._
    val target = at.getOrElse(dir)
    graft.core.Fs.delete(spark, modelStatsPath(target)) // marker down
    val (w, _, nTrain) = trainWeights(spark, dir, rounds, lr, buckets)
    w.toSeq.toDF("b", "w")
      .select(col("b"), col("w").cast("decimal(18,6)").as("w"))
      .coalesce(1).write.mode("overwrite").parquet(modelPath(target))
    Seq((buckets.toLong, rounds.toLong, math.round(lr * 1e6), nTrain))
      .toDF("buckets", "rounds", "lr_micro", "n_train")
      .coalesce(1).write.mode("overwrite").parquet(modelStatsPath(target))
  }

  /** Whether a committed model trained with `buckets` hash buckets is
    * present at `dir` (marker + weights, bucket count matching — a
    * mismatched hash space would silently mis-route every feature). */
  def hasModel(spark: SparkSession, dir: String, buckets: Int = Buckets): Boolean =
    graft.core.Fs.exists(spark, modelStatsPath(dir)) &&
      graft.core.Fs.exists(spark, modelPath(dir)) &&
      (try spark.read.parquet(modelStatsPath(dir))
        .head().getLong(0) == buckets.toLong
       catch { case scala.util.control.NonFatal(_) => false })

  /** Score ANY corpus with the model persisted at `modelDir` — zero
    * training passes: hash the corpus's presence features into the
    * model's bucket space, broadcast the O(B) weight table, sum. Same
    * margin semantics as classifierScores' final pass (docs sharing no
    * bucket with the model contribute no row, like the in-session
    * scorer). */
  def scoreWith(spark: SparkSession, corpusDir: String,
                modelDir: String): DataFrame =
    scoreFrameWith(docs(spark, corpusDir), modelDir).orderBy("doc_id")

  /** Frame-level variant (docs-shaped input) — the streaming gate's
    * shape: the O(B) weight table is SESSION-CACHED per modelDir, so a
    * micro-batch pipeline loads it once and every batch broadcasts the
    * cached frame. Docs sharing no bucket with the model get no score
    * row (nothing to assess). */
  def scoreFrameWith(df: DataFrame, modelDir: String): DataFrame = {
    val spark = df.sparkSession
    // marker first: a missing or crashed (marker-less) model must surface
    // as the intended error, not a raw AnalysisException from the stats read
    require(graft.core.Fs.exists(spark, modelStatsPath(modelDir)),
      s"no committed quality model at $modelDir")
    val stats = spark.read.parquet(modelStatsPath(modelDir)).head()
    val buckets = stats.getLong(0).toInt
    require(hasModel(spark, modelDir, buckets),
      s"no committed quality model at $modelDir")
    val wDf = graft.core.SessionCache.getOrBuild(spark, "quality_model", modelDir) {
      spark.read.parquet(modelPath(modelDir))
    }
    presenceFeatures(df, buckets)
      .join(broadcast(wDf), "b")
      .groupBy("doc_id").agg(sum("w").as("z"))
      .select(col("doc_id"), col("z").cast("double").as("score"))
  }

  /** The GD loop, shared by the query face and the artifact builder:
    * returns (weights, persisted feature frame, training doc count). */
  private def trainWeights(spark: SparkSession, dir: String, rounds: Int,
                           lr: Double, buckets: Int)
      : (Map[Long, java.math.BigDecimal], DataFrame, Long) = {
    import spark.implicits._
    // session-scoped cache (the DedupIndex trade): training touches the
    // feature stream 2x per round and the returned scoring plan reads it
    // once more — unpersisting in a finally would force that last read
    // to re-tokenize the corpus after training already paid for it
    val feats = presenceFeatures(docs(spark, dir), buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.select("doc_id").distinct().count()
    val isTarget = (col("doc_id") % 7 === 0).cast("int")
    // w starts at zero: round 1's err is exactly ±0.5 for every doc
    var w: Map[Long, java.math.BigDecimal] = Map.empty
    for (_ <- 1 to rounds) {
      val wDf = if (w.isEmpty) null
        else w.toSeq.toDF("b", "w")
          .select(col("b"), col("w").cast("decimal(18,6)").as("w"))
      val z = if (wDf == null)
        feats.select(col("doc_id")).distinct()
          .withColumn("z", lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)"))
      else feats.join(broadcast(wDf), "b")
        .groupBy("doc_id").agg(sum("w").as("z"))
      val err = z.withColumn("err",
        round(isTarget.cast("double") -
          lit(1.0) / (lit(1.0) + exp(-col("z").cast("double"))), 6)
          .cast("decimal(18,6)"))
        .select("doc_id", "err")
      val grad = feats.join(err, "doc_id")
        .groupBy("b").agg(sum("err").as("g"))
        .select(col("b"), col("g").cast("decimal(28,6)").as("g"))
        .collect()
      w = grad.map { r =>
        val b = r.getLong(0)
        val g = r.getDecimal(1).doubleValue()
        val prev = w.get(b).map(_.doubleValue()).getOrElse(0.0)
        // one double step on the 1e-6 grid, identical in the oracle
        val next = new java.math.BigDecimal(
          java.lang.Double.toString(prev + lr * g / n))
          .setScale(6, java.math.RoundingMode.HALF_UP)
        b -> next
      }.toMap
    }
    (w, feats, n)
  }

  /** Train and score: returns (doc_id, is_target, score) for every doc
    * with at least one feature, score = the final-round margin z_d as a
    * double (monotone in the model's quality probability). */
  def classifierScores(spark: SparkSession, dir: String,
                       rounds: Int = Rounds, lr: Double = LearningRate,
                       buckets: Int = Buckets): DataFrame = {
    import spark.implicits._
    val (w, feats, _) = trainWeights(spark, dir, rounds, lr, buckets)
    val wFinal = w.toSeq.toDF("b", "w")
      .select(col("b"), col("w").cast("decimal(18,6)").as("w"))
    feats.join(broadcast(wFinal), "b")
      .groupBy("doc_id").agg(sum("w").as("z"))
      .select(col("doc_id"), (col("doc_id") % 7 === 0).cast("int").as("is_target"),
        col("z").cast("double").as("score"))
      .orderBy("doc_id")
  }
}
