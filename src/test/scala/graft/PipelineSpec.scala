package graft

import graft.core.Codec
import graft.core.Schemas.TickFrame
import graft.ingest.TickDecoder
import graft.sources.FrameSpool
import graft.streaming.Bars
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** The whole live path in one test: spooled wire frames -> DataSourceV2
  * replay source -> typed decode -> watermarked 1-min OHLCV bars. */
class PipelineSpec extends SparkSpec {

  private val T0 = 1704447000000L // minute-aligned

  private def quote(token: String, seq: Long, tsMs: Long, ltpPaise: Long): Array[Byte] =
    Codec.encode(TickFrame(2, 1, token, seq, tsMs, ltpPaise,
      Some(1L), Some(ltpPaise), Some(10L), Some(1.0), Some(1.0),
      Some(ltpPaise), Some(ltpPaise), Some(ltpPaise), Some(ltpPaise)))

  test("spool -> DSv2 source -> decode -> 1-min bars") {
    import spark.implicits._
    val spool = Files.createTempDirectory("pipespool").toString
    FrameSpool.write(spool, Seq(
      quote("2885", 1, T0 + 5000, 100_00L),
      quote("2885", 2, T0 + 30000, 103_00L),
      quote("2885", 3, T0 + 55000, 101_00L),
      quote("2885", 9, T0 + 300000, 110_00L)), "w0") // watermark pusher

    val frames = spark.readStream
      .format("graft.sources.FrameReplayProvider")
      .option("path", spool).load()
      .select(col("payload")).as[Array[Byte]]
    val bars = Bars.oneMinute(TickDecoder.decode(spark, frames).toDF())
    val q = bars.writeStream.format("memory").queryName("pipe_bars")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("pipe_bars").collect()
    assert(closed.length === 1)
    val bar = closed(0)
    assert(bar.getAs[Timestamp]("bar_start").getTime === T0)
    assert(bar.getAs[Double]("open_price") === 100.0)
    assert(bar.getAs[Double]("high_price") === 103.0)
    assert(bar.getAs[Double]("close_price") === 101.0)
    assert(bar.getAs[Long]("tick_count") === 3L)
  }

  test("decode throughput beats the reference design point by orders of magnitude") {
    import spark.implicits._
    val n = 200000
    val payload = quote("2885", 1, T0, 100_00L)
    val frames = spark.range(n).map(_ => payload)
    TickDecoder.decode(spark, frames).count() // warm
    val t0 = System.nanoTime()
    val decoded = TickDecoder.decode(spark, frames).count()
    val rate = decoded / ((System.nanoTime() - t0) / 1e9)
    info(f"decode path: $rate%.0f frames/s (reference design point: 200/s)")
    assert(decoded === n)
    assert(rate > 20000, f"decode path too slow: $rate%.0f frames/s")
  }

  test("console debug sink runs and terminates (K4)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
    stream.addData(quote("2885", 1, T0, 100_00L))
    val q = graft.ingest.IngestStream.startConsole(spark, stream.toDS(),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    q.processAllAvailable()
    q.stop()
    succeed
  }
}
