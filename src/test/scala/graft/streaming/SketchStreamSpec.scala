package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming count-min grid must equal the batch grid over the same
  * docs — the mergeable-sketch property is exactly what makes it a
  * valid streaming aggregation, and one hash definition serves both. */
class SketchStreamSpec extends SparkSpec {

  test("streaming CMS cells == batch cells over the same two batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val b1 = Seq((1L, "the quick brown fox"), (2L, "the lazy dog"))
    val b2 = Seq((3L, "the quick dog again"), (4L, "completely new words"))

    val stream = MemoryStream[(Long, String)]
    val cells = Sketches.cmsCells(
      stream.toDF().toDF("doc_id", "text"), d = 4, w = 64)
    val q = cells.writeStream
      .format("memory").queryName("cms_cells_test")
      .outputMode("complete").start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    // mid-stream: state reflects batch 1 only
    val mid = spark.table("cms_cells_test").agg(sum("cell")).head().getLong(0)
    assert(mid === b1.flatMap(_._2.split(" ")).length * 4L)

    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cms_cells_test").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    // batch recompute over the union of both batches
    val batchDocs = (b1 ++ b2).toDF("doc_id", "text")
    val batch = batchDocs
      .withColumn("ws", graft.ops.TextHashing.words(col("text")))
      .select(explode(col("ws")).as("w"))
      .select(posexplode(
        graft.ops.TextAnalysis.cmsCellColumns(col("w"), 4, 64))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cell"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)

    // a probe estimated from the streamed grid: "the" appears 3 times,
    // estimate = min over its 4 cells >= 3
    val buckets = batchDocs.sparkSession.range(1)
      .select(graft.ops.TextAnalysis.cmsCellColumns(lit("the"), 4, 64).as("bs"))
      .head().getSeq[Long](0)
    val est = buckets.zipWithIndex.map { case (b, i) => streamed((i, b)) }.min
    assert(est >= 3L)
  }

  test("streaming HLL registers == batch registers; max-merge absorbs re-sends") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val b1 = Seq((1L, "alpha beta gamma delta epsilon", "web"),
      (2L, "zeta eta theta iota kappa", "books"))
    val b2 = Seq((3L, "lambda mu nu xi omicron pi", "web"),
      (1L, "alpha beta gamma delta epsilon", "web")) // exact re-send
    val stream = MemoryStream[(Long, String, String)]
    val regs = Sketches.hllRegisters(
      stream.toDF().toDF("doc_id", "text", "source"))
    val q = regs.writeStream.format("memory").queryName("hll_regs_test")
      .outputMode("complete").start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_regs_test").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

    val batch = graft.ops.TextAnalysis.hllRegistersOf(
      (b1 ++ b2).toDF("doc_id", "text", "source")
        .withColumn("ws", graft.ops.TextHashing.words(col("text")))
        .select(col("source"),
          explode(graft.ops.TextDedup.ngramsOf(col("ws"), 3)).as("gram")),
      m = 64).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    // max-merge: the duplicate doc re-send cannot move any register
    assert(streamed === batch)
    assert(streamed.keys.map(_._1).toSet === Set("web", "books"))
  }

  test("streaming quantile-histogram cells == batch cells; estimate brackets the true quantile") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val b = 16
    val lo = 0.0; val hi = 160.0
    val width = (hi - lo) / b
    val b1 = (1 to 40).map(i => ("click", i * 2.0))
    val b2 = (41 to 80).map(i => ("click", i * 2.0)) ++
      Seq(("view", 5.0), ("view", 155.0))

    val stream = MemoryStream[(String, Double)]
    val cells = Sketches.histogramCells(
      stream.toDF().toDF("event_type", "value"), lo, hi, b)
    val q = cells.writeStream.format("memory").queryName("qh_cells_test")
      .outputMode("complete").start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qh_cells_test").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    // batch recompute with the same fixed domain
    val batch = (b1 ++ b2).toDF("event_type", "value")
      .select(col("event_type"),
        graft.ops.QuantileSketch.bucketCol(
          col("value"), lit(lo), lit(width), b).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("cell"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)

    // cold-consumer readout from the streamed state: p50 of the 80
    // click values (2..160) — upper edge of the bucket where the
    // cumulative count first reaches ceil(0.5 * 80) = 40
    val clicks = streamed.collect { case (("click", bk), c) => bk -> c }
      .toSeq.sortBy(_._1)
    val n = clicks.map(_._2).sum
    val cum = clicks.scanLeft(0L)(_ + _._2).tail
    val idx = cum.indexWhere(_ >= math.ceil(0.5 * n).toLong)
    val est = lo + (clicks(idx)._1 + 1) * width
    val trueP50 = 81.0 // median of 2,4,...,160
    assert(est >= trueP50 && est - trueP50 <= width,
      s"stream-state estimate $est must bracket $trueP50 within $width")
  }

  test("ADAPTIVE streaming histogram: unknown-domain batches, readout within 1/16 relative") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the case the fixed-domain face cannot express: the first batch
    // lives in milliseconds, the second NINE orders of magnitude up —
    // no caller could have pinned [lo, hi) at stream start
    val b1 = (1 to 50).map(i => ("lat", i * 0.001))
    val b2 = (1 to 50).map(i => ("lat", i * 1000000.0))

    val stream = MemoryStream[(String, Double)]
    val cells = Sketches.logHistogramCells(
      stream.toDF().toDF("event_type", "value"))
    val q = cells.writeStream.format("memory").queryName("qh_log_test")
      .outputMode("complete").start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qh_log_test").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    // stream state == batch recompute (same key definition, no domain)
    val batch = (b1 ++ b2).toDF("event_type", "value")
      .select(col("event_type"),
        graft.ops.QuantileSketch.logBucketCol(col("value")).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("cell"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)

    // cold-consumer readout for p50/p90/p99 against the exact order
    // statistics of the union: within the proven 1/16 relative bound
    val lat = streamed.collect { case (("lat", k), c) => k -> c }
      .toSeq.sortBy(_._1)
    val n = lat.map(_._2).sum
    val cum = lat.scanLeft(0L)(_ + _._2).tail
    val sortedVals = (b1 ++ b2).map(_._2).sorted
    for (qv <- Seq(0.5, 0.9, 0.99)) {
      val k = math.ceil(qv * n).toLong
      val idx = cum.indexWhere(_ >= k)
      val est = graft.plans.Log2BucketExpr.upperEdge(lat(idx)._1)
      val xk = sortedVals(k.toInt - 1)
      assert(est > xk && est <= xk * (17.0 / 16.0),
        s"p$qv: readout $est must bracket $xk within 1/16 relative")
    }
  }
}
