package graft.sources

import graft.SparkSpec
import graft.core.Codec
import graft.core.Schemas.TickFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DataSourceV2 replay source: paced micro-batches, offset restart. */
class FrameReplaySpec extends SparkSpec {

  private def frame(token: String, seq: Long): Array[Byte] =
    Codec.encode(TickFrame(1, 1, token, seq, 1704447000000L + seq * 1000, 100L * seq,
      None, None, None, None, None, None, None, None, None))

  test("reads spooled frames through readStream with batch pacing") {
    val spool = Files.createTempDirectory("dsv2spool").toString
    FrameSpool.write(spool, (1L to 7L).map(frame("2885", _)), "part-000")
    FrameSpool.write(spool, (8L to 10L).map(frame("2885", _)), "part-001")

    val df = spark.readStream
      .format("graft.sources.FrameReplayProvider")
      .option("path", spool)
      .option("maxFramesPerBatch", "4")
      .load()
    val q = df.writeStream.format("memory").queryName("replay_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("replay_out").collect()
    assert(out.length === 10, "all frames across both files must arrive")
    // pacing: 10 frames at <=4/batch means at least 3 micro-batches ran
    val payloads = out.map(_.getAs[Array[Byte]]("payload"))
    val decoded = payloads.map(Codec.decode(_).toOption.get.sequenceNumber).sorted
    assert(decoded === (1L to 10L).toArray)
  }

  test("a new spool file sorting BEFORE consumed ones neither skips nor duplicates") {
    import spark.implicits._
    val spool = Files.createTempDirectory("dsv2order").toString
    val ckpt = Files.createTempDirectory("dsv2orderckpt").toString
    val sink = Files.createTempDirectory("dsv2ordersink").toString
    // consume a file named "m" first...
    FrameSpool.write(spool, (1L to 4L).map(frame("ORD", _)), "m")
    def run(): Unit = {
      val q = spark.readStream
        .format("graft.sources.FrameReplayProvider")
        .option("path", spool).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink)
        }
        .trigger(Trigger.ProcessingTime("1 second")).start()
      q.processAllAvailable()
      q.stop()
    }
    run()
    // ...then add a file that sorts BEFORE it — a cumulative offset would
    // remap committed progress (re-reading "m" and skipping "a")
    FrameSpool.write(spool, (5L to 7L).map(frame("ORD", _)), "a")
    run()
    val seqs = spark.read.parquet(sink).collect()
      .map(r => Codec.decode(r.getAs[Array[Byte]]("payload")).toOption.get.sequenceNumber)
      .sorted
    assert(seqs === (1L to 7L).toArray,
      "per-segment offsets must survive out-of-order segment names")
  }

  test("Trigger.AvailableNow drains the spool in paced batches, then stops") {
    val spool = Files.createTempDirectory("dsv2avnow").toString
    FrameSpool.write(spool, (1L to 9L).map(frame("AV", _)), "w0")
    val q = spark.readStream
      .format("graft.sources.FrameReplayProvider")
      .option("path", spool)
      .option("maxFramesPerBatch", "4")
      .load()
      .writeStream.format("memory").queryName("avnow_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    val seqs = spark.table("avnow_out").collect()
      .map(r => Codec.decode(r.getAs[Array[Byte]]("payload")).toOption.get.sequenceNumber)
      .sorted
    assert(seqs === (1L to 9L).toArray, "backfill must drain the whole spool")
  }

  test("a torn trailing frame is not admitted until its payload completes") {
    import spark.implicits._
    val spool = Files.createTempDirectory("dsv2torn").toString
    val full = FrameSpool.write(spool, (1L to 3L).map(frame("TORN", _)), "w0")
    // simulate a live recorder mid-write: length prefix flushed, payload cut
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(full))
    java.nio.file.Files.write(java.nio.file.Paths.get(full),
      bytes.dropRight(10)) // third record now torn
    val counted = FrameSpool.listFiles(spool).map(_._2).sum
    assert(counted === 2, "torn trailing record must not be counted")
    // completing the file makes the third frame visible
    java.nio.file.Files.write(java.nio.file.Paths.get(full), bytes)
    assert(FrameSpool.listFiles(spool).map(_._2).sum === 3)
  }

  test("live in-memory source round-trips frames appended while running") {
    val channel = "spec-live-1"
    LiveFrameFeed.clear(channel)
    (1L to 5L).foreach(s => LiveFrameFeed.append(channel, frame("LIVE", s)))

    val q = spark.readStream
      .format("graft.sources.FrameReplayProvider")
      .option("source", "memory")
      .option("channel", channel)
      .option("maxFramesPerBatch", "3")
      .load()
      .writeStream.format("memory").queryName("live_out")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    q.processAllAvailable()
    // the "broker" pushes more frames while the query is running — the
    // growing-segment path a real WebSocket FrameSource exercises
    (6L to 8L).foreach(s => LiveFrameFeed.append(channel, frame("LIVE", s)))
    q.processAllAvailable()
    q.stop()

    val seqs = spark.table("live_out").collect()
      .map(r => Codec.decode(r.getAs[Array[Byte]]("payload")).toOption.get.sequenceNumber)
      .sorted
    assert(seqs === (1L to 8L).toArray,
      "frames appended mid-run must arrive exactly once, none lost")
    LiveFrameFeed.clear(channel)
  }

  test("offset restart: resumes from checkpoint without re-reading") {
    import spark.implicits._
    val spool = Files.createTempDirectory("dsv2spool2").toString
    val ckpt = Files.createTempDirectory("dsv2ckpt").toString
    val sink = Files.createTempDirectory("dsv2sink").toString
    FrameSpool.write(spool, (1L to 3L).map(frame("X", _)), "a")

    def run(): Unit = {
      val q = spark.readStream
        .format("graft.sources.FrameReplayProvider")
        .option("path", spool).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink)
        }
        .trigger(Trigger.ProcessingTime("1 second")).start()
      q.processAllAvailable()
      q.stop()
    }
    run()
    assert(spark.read.parquet(sink).count() === 3)
    FrameSpool.write(spool, (4L to 5L).map(frame("X", _)), "b")
    run()
    val all = spark.read.parquet(sink).collect()
      .map(r => Codec.decode(r.getAs[Array[Byte]]("payload")).toOption.get.sequenceNumber)
    assert(all.sorted === (1L to 5L).toArray, "restart must not duplicate or lose frames")
  }
}
