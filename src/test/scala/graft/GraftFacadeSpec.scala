package graft

import graft.core.{Codec, Schemas}
import graft.sources.{FrameSpool, LiveFrameFeed}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The facade end-to-end: session -> live ingest -> queries -> metrics —
  * the reference user's whole workflow through one object. */
class GraftFacadeSpec extends AnyFunSuite {

  private def frame(token: String, seq: Long, tsMs: Long, ltp: Long): Array[Byte] =
    Codec.encode(Schemas.TickFrame(2, 1, token, seq, tsMs, ltp,
      Some(5L), Some(ltp), Some(10L), Some(1.0), Some(2.0),
      Some(ltp - 50), Some(ltp + 100), Some(ltp - 100), Some(ltp)))

  private def tokensJson(): String = {
    val f = new java.io.File(Files.createTempDirectory("gtok").toFile, "tokens.json")
    Files.writeString(f.toPath,
      """{"symbol": "RELIANCE", "token": "2885", "exchange": "NSE_CM"}""")
    f.getAbsolutePath
  }

  test("session -> live feed -> ingest -> query -> metrics, end to end") {
    val spark = Graft.session(cores = 4)
    try {
      val t0 = 1704447000000L
      val channel = "facade-live"
      LiveFrameFeed.clear(channel)
      (1L to 5L).foreach(s => LiveFrameFeed.append(channel, frame("2885", s, t0 + s * 1000, 286500L + s)))

      val sink = Files.createTempDirectory("gsink").toString
      val ckpt = Files.createTempDirectory("gckpt").toString
      val (listener, server) = Graft.serveMetrics(spark)
      try {
        val q = Graft.ingestLive(spark, channel, tokensJson(), sink, ckpt,
          Trigger.ProcessingTime("1 second"))
        q.processAllAvailable()
        q.stop()

        val latest = queries.TickQueries.latestTick(Graft.ticks(spark, sink), "2885").collect()
        assert(latest.length === 1)
        assert(latest(0).getAs[Long]("sequence_number") === 5L)
        assert(latest(0).getAs[String]("symbol") === "RELIANCE")

        val deadline = System.currentTimeMillis() + 10000
        while (listener.rowsProcessed.get < 5 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        val metrics = scala.io.Source.fromURL(
          s"http://127.0.0.1:${server.boundPort}/metrics").mkString
        assert(metrics.contains("graft_ticks_processed_total 5"))
      } finally {
        server.stop()
        spark.streams.removeListener(listener)
        LiveFrameFeed.clear(channel)
      }
    } finally () // shared-session harness: do not stop the JVM-wide session
  }
}
