package graft.obs

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** HTTP observability endpoints: /metrics + /health served during a
  * streaming run (parity with /root/reference/main.go:351-367). */
class ObsSpec extends SparkSpec {

  private def fetch(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = scala.io.Source.fromInputStream(is).mkString
    (code, body)
  }

  test("/metrics and /health serve listener state over HTTP") {
    import spark.implicits._
    val listener = new IngestMetricsListener
    spark.streams.addListener(listener)
    val srv = new MetricsHttpServer(listener).start()
    try {
      implicit val ctx = spark.sqlContext
      val stream = MemoryStream[Int]
      stream.addData(1, 2, 3)
      val q = stream.toDS().writeStream.format("memory").queryName("obs_out")
        .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
      q.processAllAvailable()
      q.stop()
      // listener bus is async; wait for the progress event to land
      val deadline = System.currentTimeMillis() + 10000
      while (listener.batchesProcessed.get == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(listener.batchesProcessed.get > 0, "listener saw no progress event")

      val (mCode, metrics) = fetch(s"http://127.0.0.1:${srv.boundPort}/metrics")
      assert(mCode === 200)
      assert(metrics.contains("graft_ticks_processed_total 3"))
      assert(metrics.contains("graft_batches_processed_total"))

      val (hCode, health) = fetch(s"http://127.0.0.1:${srv.boundPort}/health")
      assert(hCode === 200)
      assert(health.contains("\"status\":\"ok\""))
      assert(health.contains("\"rows\":3"))

      // a dead query flips health to degraded/503 (monitoring/health.go
      // reports component state, not a static ok)
      listener.queryErrors.incrementAndGet()
      val (dCode, degraded) = fetch(s"http://127.0.0.1:${srv.boundPort}/health")
      assert(dCode === 503)
      assert(degraded.contains("\"status\":\"degraded\""))
    } finally {
      srv.stop()
      spark.streams.removeListener(listener)
    }
  }
}
