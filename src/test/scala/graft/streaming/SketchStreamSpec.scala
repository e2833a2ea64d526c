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
}
