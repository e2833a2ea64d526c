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
final class MetricsHttpServer(listener: IngestMetricsListener, port: Int = 0) {

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
    respond(ex, 200, "text/plain; version=0.0.4", listener.snapshot() + "\n"))

  server.createContext("/health", { (ex: HttpExchange) =>
    val healthy = listener.queryErrors.get == 0
    val status = if (healthy) "ok" else "degraded"
    val body =
      s"""{"status":"$status","batches":${listener.batchesProcessed.get},""" +
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
