package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQ8 semantics on crafted fixtures: reconstruction error bounds,
  * ranking sanity, and cold-session persisted-index behavior. */
class ScalarQuantSpec extends SparkSpec {

  private def writeFixture(): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("sqfix").toString
    val base = (1 to 64).map(i => math.sin(i.toDouble).toFloat).toArray
    def rot(k: Int) = (1 to 64).map(i => math.cos(i * (k + 2.0)).toFloat).toArray
    val rows = Seq(
      (0L, base, 0),
      (1L, base.map(x => x * 2.0f), 0), // colinear with 0: cosine 1
      (2L, rot(1), 1), (3L, rot(2), 1), (4L, rot(3), 1),
      (5L, rot(4), 2), (6L, rot(5), 2), (7L, rot(6), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val dir = writeFixture()

  test("decode(encode(v)) is within half a quantization step per dimension") {
    val (mn, mx) = {
      // recompute the bound from the corpus: step_d = (mx_d - mn_d)/255
      val aggs = (1 to 64).map(i => min(element_at(col("v"), i))) ++
        (1 to 64).map(i => max(element_at(col("v"), i)))
      val r = Similarity.emb(spark, dir).agg(aggs.head, aggs.tail: _*).head()
      ((0 until 64).map(r.getDouble), (64 until 128).map(r.getDouble))
    }
    val e = Similarity.emb(spark, dir)
    val errs = e.select(col("vec_id"), col("v"),
      ScalarQuant.decodeCol(mn, mx, ScalarQuant.encodeCol(mn, mx)).as("vhat"))
      .select(explode(zip_with(col("v"), col("vhat"), (a, b) => abs(a - b))).as("err"),
        lit(1).as("one"))
      .agg(max("err")).head().getDouble(0)
    val maxStep = (0 until 64).map(i => (mx(i) - mn(i)) / 255.0).max
    assert(errs <= maxStep / 2.0 + 1e-12)
  }

  test("SQ ADC ranks the colinear vector first, with near-1 similarity") {
    val top = ScalarQuant.sqTopKFor(spark, dir, Seq(0L), 3).collect()
    assert(top.head.getAs[Long]("vec_id") === 1L)
    assert(top.head.getAs[Double]("approx_sim") > 0.999)
  }

  test("SQ rerank returns EXACT similarities (matches brute force)") {
    val sq = ScalarQuant.sqTopKReranked(spark, dir, Seq(0L, 2L), 3, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val bf = Similarity.bruteForceTopKFor(spark, dir, Seq(0L, 2L), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(sq === bf) // shortlist covers the whole 8-vector corpus: identical
  }

  test("persisted SQ index: cold read path, zero training, same results") {
    val d2 = writeFixture()
    val before = ScalarQuant.sqTopKFor(spark, d2, Seq(0L), 3).collect().toSeq
    ScalarQuant.buildSqIndex(spark, d2)
    ScalarQuant.invalidateSq(spark, d2)
    graft.core.SessionCache.invalidate(spark, "emb", d2)
    val t0 = ScalarQuant.trainRuns.get
    val after = ScalarQuant.sqTopKFor(spark, d2, Seq(0L), 3).collect().toSeq
    assert(after === before)
    assert(ScalarQuant.trainRuns.get === t0) // min/max came from the marker file
  }

  test("a crashed build (codes without the min/max marker) is ignored") {
    val d2 = writeFixture()
    ScalarQuant.buildSqIndex(spark, d2)
    // simulate the crash: marker gone, stale codes linger
    val p = new org.apache.hadoop.fs.Path(ScalarQuant.sqMinMaxPath(d2))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ScalarQuant.invalidateSq(spark, d2)
    val t0 = ScalarQuant.trainRuns.get
    val r = ScalarQuant.sqTopKFor(spark, d2, Seq(0L), 3).collect()
    assert(r.nonEmpty)
    assert(ScalarQuant.trainRuns.get === t0 + 1) // re-derived, not trusted
  }

  test("SQ probe plan: query side broadcasts, no cartesian product") {
    val plan = ScalarQuant.sqTopKFor(spark, dir, Seq(0L, 2L), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
