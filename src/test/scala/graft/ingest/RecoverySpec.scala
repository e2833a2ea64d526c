package graft.ingest

import graft.SparkSpec
import graft.core.Codec
import graft.core.Schemas.TickFrame
import graft.storage.TickTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** T8 checkpoint recovery: a restarted query resumes from the committed
  * offsets — no loss, no duplication of already-sunk batches. */
class RecoverySpec extends SparkSpec {

  private def frame(token: String, seq: Long, tsMs: Long): Array[Byte] =
    Codec.encode(TickFrame(1, 1, token, seq, tsMs, 100L * seq,
      None, None, None, None, None, None, None, None, None))

  test("restart from checkpoint: batch 2 appends exactly once") {
    import spark.implicits._
    val sink = Files.createTempDirectory("sink").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val dim = spark.emptyDataFrame.selectExpr("'x' as token", "'X' as symbol")

    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Array[Byte]]
    val t0 = 1704447000000L
    stream.addData(frame("2885", 1, t0), frame("2885", 2, t0 + 1000))
    val q1 = IngestStream.start(spark, stream.toDS(), dim, sink, ckpt,
      Trigger.ProcessingTime("1 second"))
    q1.processAllAvailable()
    q1.stop()
    assert(TickTable.read(spark, sink).count() === 2)

    stream.addData(frame("2885", 3, t0 + 2000))
    val q2 = IngestStream.start(spark, stream.toDS(), dim, sink, ckpt,
      Trigger.ProcessingTime("1 second"))
    q2.processAllAvailable()
    q2.stop()

    val out = TickTable.read(spark, sink)
    assert(out.count() === 3, "exactly one new row after recovery")
    assert(out.select("sequence_number").distinct().count() === 3)
  }

  test("tick-table time-range scan prunes partitions") {
    import spark.implicits._
    val path = Files.createTempDirectory("ticks").toString
    val day1 = 1704412800000L // 2024-01-05 00:00 UTC
    val day2 = day1 + 86400000L
    val ticks = graft.ingest.TickDecoder.decode(spark,
      Seq(frame("A", 1, day1 + 3600000), frame("A", 2, day2 + 3600000)).toDS())
    TickTable.append(ticks.toDF(), path)

    val scan = TickTable.timeRange(spark, path, "2024-01-05 00:00:00", "2024-01-06 00:00:00")
    assert(scan.count() === 1)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
  }

  test("partition compaction merges micro-batch files, preserves rows") {
    import spark.implicits._
    val path = Files.createTempDirectory("compact").toString
    val day = 1704412800000L // 2024-01-05
    // three separate appends = at least three files in the partition
    for (i <- 1 to 3) {
      val ticks = graft.ingest.TickDecoder.decode(spark,
        Seq(frame("A", i.toLong, day + i * 1000)).toDS())
      TickTable.append(ticks.toDF(), path)
    }
    def partFiles() = {
      val d = new java.io.File(s"$path/trade_date=2024-01-05")
      d.listFiles().count(f => f.getName.endsWith(".parquet"))
    }
    assert(partFiles() >= 3)
    assert(TickTable.read(spark, path).count() === 3)
    TickTable.compactPartition(spark, path, "2024-01-05", numFiles = 1)
    assert(partFiles() === 1, "compaction must leave one file")
    val rows = TickTable.read(spark, path)
    assert(rows.count() === 3)
    assert(rows.select("sequence_number").distinct().count() === 3)
  }

  test("metrics listener counts processed rows and batches") {
    import spark.implicits._
    val listener = new graft.obs.IngestMetricsListener
    spark.streams.addListener(listener)
    try {
      val sink = Files.createTempDirectory("lsink").toString
      val ckpt = Files.createTempDirectory("lckpt").toString
      val dim = spark.emptyDataFrame.selectExpr("'x' as token", "'X' as symbol")
      implicit val ctx = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
      stream.addData(frame("2885", 1, 1704447000000L), frame("2885", 2, 1704447001000L))
      val q = IngestStream.start(spark, stream.toDS(), dim, sink, ckpt,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      q.processAllAvailable()
      q.stop()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.rowsProcessed.get < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.rowsProcessed.get >= 2)
      assert(listener.batchesProcessed.get >= 1)
      assert(listener.snapshot().contains("graft_ticks_processed_total"))
    } finally spark.streams.removeListener(listener)
  }

  test("idempotent batch append: replaying a batch does not duplicate") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("idem").toString
    val ticks = graft.ingest.TickDecoder.decode(spark,
      Seq(frame("A", 1, 1704447000000L), frame("A", 2, 1704447001000L)).toDS()).toDF()
    TickTable.appendBatch(ticks, path, batchId = 7)
    TickTable.appendBatch(ticks, path, batchId = 7) // crash-replay of batch 7
    assert(TickTable.read(spark, path).count() === 2, "replay must overwrite, not append")
    TickTable.appendBatch(ticks, path, batchId = 8) // a NEW batch still appends
    assert(TickTable.read(spark, path).count() === 4)
  }

  test("compaction preserves the (trade_date, batch_id) streaming-sink layout") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("compactbid").toString
    val day = 1704412800000L
    for (b <- 1 to 3) {
      val ticks = graft.ingest.TickDecoder.decode(spark,
        Seq(frame("A", b.toLong, day + b * 1000)).toDS()).toDF()
      TickTable.appendBatch(ticks, path, batchId = b.toLong)
    }
    assert(TickTable.read(spark, path).count() === 3)
    TickTable.compactPartition(spark, path, "2024-01-05", numFiles = 1)
    val after = TickTable.read(spark, path) // partition discovery must still work
    assert(after.count() === 3)
    assert(after.select(col("batch_id").cast("long")).distinct().collect().map(_.getLong(0)).toSeq === Seq(-1L))
    // idempotent appends still work post-compaction
    val more = graft.ingest.TickDecoder.decode(spark,
      Seq(frame("A", 9, day + 9000)).toDS()).toDF()
    TickTable.appendBatch(more, path, batchId = 9)
    assert(TickTable.read(spark, path).count() === 4)
  }
}
