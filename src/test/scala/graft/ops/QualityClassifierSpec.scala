package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Semantic checks for the in-engine trained quality classifier: GD on
  * the hashed-feature logistic model must separate target-like docs from
  * unrelated ones, improve with rounds, and stay deterministic. */
class QualityClassifierSpec extends SparkSpec {

  // same fixture shape as ImportanceSpec: target slice (0, 7) = finance
  // vocabulary; raw docs 1-3 finance-like, 4-6 unrelated
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("qcfix").toString
    Seq(
      (0L, "stocks rally as market gains lift bank shares higher today"),
      (7L, "bank stocks extend market rally with broad sector gains again"),
      (1L, "market rally continues as bank stocks post fresh gains"),
      (2L, "shares of the bank rose in a broad market rally"),
      (3L, "sector gains lift stocks as the rally extends further"),
      (4L, "the recipe calls for flour butter sugar and three eggs"),
      (5L, "migrating birds cross the valley before the first autumn frost"),
      (6L, "the violin section tuned quietly before the evening concert began"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("trained classifier separates target-like raw docs from unrelated ones") {
    val scores = QualityClassifier.classifierScores(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size === 8)
    // finance raw docs outrank all non-finance raw docs
    assert(Seq(1L, 2L, 3L).map(scores).min > Seq(4L, 5L, 6L).map(scores).max)
    // the target docs themselves score at the top
    assert(Seq(0L, 7L).map(scores).min > Seq(4L, 5L, 6L).map(scores).max)
  }

  test("margins grow with training rounds on the positive class") {
    def meanTarget(rounds: Int): Double = {
      val s = QualityClassifier.classifierScores(spark, dir, rounds = rounds)
        .collect().filter(_.getInt(1) == 1).map(_.getDouble(2))
      s.sum / s.length
    }
    assert(meanTarget(3) > meanTarget(1))
  }

  test("training is deterministic") {
    val a = QualityClassifier.classifierScores(spark, dir).collect().toSeq
    val b = QualityClassifier.classifierScores(spark, dir).collect().toSeq
    assert(a === b)
  }

  test("persisted model: score-anywhere matches in-session scores; marker gates") {
    QualityClassifier.buildModel(spark, dir)
    assert(QualityClassifier.hasModel(spark, dir))
    assert(!QualityClassifier.hasModel(spark, dir, buckets = 128),
      "a bucket-count mismatch must not validate the artifact")
    // scoring the TRAINING corpus with the artifact reproduces the
    // in-session margins exactly (same weights, same feature hash)
    val inSession = QualityClassifier.classifierScores(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val viaModel = QualityClassifier.scoreWith(spark, dir, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaModel === inSession)
    // cross-corpus: a foreign finance-like doc outranks a foreign
    // unrelated doc under the persisted model, no training on it
    import spark.implicits._
    val d2 = Files.createTempDirectory("qcforeign").toString
    Seq(
      (100L, "bank stocks rally as market gains extend the sector"),
      (101L, "fold the butter into the flour before the eggs"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val f = QualityClassifier.scoreWith(spark, d2, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(f(100L) > f(101L), s"persisted model must transfer: $f")
  }

  test("streaming model gate: below-threshold docs never reach the corpus") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    QualityClassifier.buildModel(spark, dir)
    val txtGood = "bank stocks rally as market gains extend the sector"
    val txtBad = "fold the butter into the flour before the eggs"
    // derive the gate threshold from the model itself (midpoint of the
    // two margins) — the spec then proves the GATE, not a magic number
    val probe = Files.createTempDirectory("qcprobe").toString
    Seq((100L, txtGood), (101L, txtBad))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$probe/documents.parquet")
    val f = QualityClassifier.scoreWith(spark, probe, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mid = (f(100L) + f(101L)) / 2
    val base = Files.createTempDirectory("qcgate").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CurationPipeline.streamingDedup(
      stream.toDS().toDF("doc_id", "text"),
      s"$base/docs", s"$base/fp", s"$base/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      modelDir = Some(dir), minScore = mid)
    stream.addData((100L, txtGood), (101L, txtBad))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$base/docs").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(100L),
      s"only the above-threshold doc may pass (scores $f, cut $mid)")
  }
}
