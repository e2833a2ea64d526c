package graft.obs

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Observability counters (SURVEY §2.2 K5) — parity with the reference's
  * Prometheus metrics (/root/reference/metrics/metrics.go:59-70:
  * processed-total, error-total, last-processed-timestamp, uptime) via a
  * StreamingQueryListener instead of a scrape endpoint.
  */
final class IngestMetricsListener extends StreamingQueryListener {

  val rowsProcessed = new AtomicLong(0)
  val batchesProcessed = new AtomicLong(0)
  val lastProgressEpochMs = new AtomicLong(0)
  val startedAtMs = new AtomicLong(0)
  val queryErrors = new AtomicLong(0)

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    startedAtMs.compareAndSet(0, System.currentTimeMillis())

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    rowsProcessed.addAndGet(event.progress.numInputRows)
    batchesProcessed.incrementAndGet()
    // numeric, not the ISO string: a bare string value is not valid
    // Prometheus text exposition and would fail the whole scrape
    try lastProgressEpochMs.set(
      java.time.Instant.parse(event.progress.timestamp).toEpochMilli)
    catch { case _: java.time.format.DateTimeParseException => }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    if (event.exception.isDefined) queryErrors.incrementAndGet()

  /** Text snapshot, shape-compatible with the reference's /metrics text
    * exposition (/root/reference/main.go:358-367) — every value numeric,
    * so a Prometheus scraper parses it. */
  def snapshot(): String = {
    val uptime = if (startedAtMs.get == 0) 0 else System.currentTimeMillis() - startedAtMs.get
    s"""graft_ticks_processed_total ${rowsProcessed.get}
       |graft_batches_processed_total ${batchesProcessed.get}
       |graft_query_errors_total ${queryErrors.get}
       |graft_uptime_millis $uptime
       |graft_last_progress_epoch_ms ${lastProgressEpochMs.get}""".stripMargin
  }
}
