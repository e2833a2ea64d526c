package graft.obs

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** HTTP observability endpoints — parity with the reference's
  * GET /metrics (Prometheus text exposition, /root/reference/main.go:358-367)
  * and GET /health (/root/reference/main.go:351-355,
  * /root/reference/monitoring/health.go:31-57), served off the driver over
  * the JDK's built-in httpserver (no extra dependency).
  *
  * /metrics — the IngestMetricsListener counters as text exposition.
  * /health — JSON status: "ok" while no streaming query has died, else
  *           "degraded" (the richer semantics of monitoring/health.go,
  *           which reports component state, not a static ok).
  *
  * Bind to port 0 for an ephemeral port (tests); `boundPort` reports it.
  */
final class MetricsHttpServer(listener: IngestMetricsListener, port: Int = 0,
                              workers: Option[WorkerStatsListener] = None) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // small pool, NOT the dispatcher thread: one stalled client must not
  // block /health for the orchestrator
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
  server.setExecutor(pool)

  private def respond(ex: HttpExchange, status: Int, contentType: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  server.createContext("/metrics", (ex: HttpExchange) =>
    respond(ex, 200, "text/plain; version=0.0.4",
      (listener.snapshot() +: workers.map(_.snapshot()).toSeq)
        .filter(_.nonEmpty).mkString("\n") + "\n"))

  // component health registry, the reference's RegisterHealthCheck shape
  // (/root/reference/monitoring/health.go:27-29,46-53): each component a
  // name -> check, any failing check degrades the rollup. "streaming" is
  // pre-registered; callers add sources/sinks/indexes as they come up.
  private val healthChecks =
    new java.util.concurrent.ConcurrentHashMap[String, () => Boolean]()
  registerHealthCheck("streaming", () => listener.queryErrors.get == 0)

  def registerHealthCheck(name: String, check: () => Boolean): Unit = {
    healthChecks.put(name, check)
    ()
  }

  server.createContext("/health", { (ex: HttpExchange) =>
    import scala.jdk.CollectionConverters._
    // a check that THROWS is unhealthy, not a 500: the health endpoint
    // must stay scrapeable while a component is mid-failure
    val comps = healthChecks.asScala.toSeq.sortBy(_._1).map { case (n, c) =>
      n -> (try c() catch { case _: Throwable => false })
    }
    val healthy = comps.forall(_._2)
    val status = if (healthy) "ok" else "degraded"
    val compJson = comps.map { case (n, ok) =>
      s""""$n":"${if (ok) "healthy" else "unhealthy"}"""" }.mkString("{", ",", "}")
    val body =
      s"""{"status":"$status","component_status":$compJson,""" +
        s""""batches":${listener.batchesProcessed.get},""" +
        s""""rows":${listener.rowsProcessed.get},"query_errors":${listener.queryErrors.get}}"""
    respond(ex, if (healthy) 200 else 503, "application/json", body)
  })

  def start(): MetricsHttpServer = { server.start(); this }

  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
    ()
  }
}
