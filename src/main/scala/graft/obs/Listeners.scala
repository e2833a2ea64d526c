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

  /** Bucketed batch-duration histogram — the `_bucket` series a
    * dashboard built against the reference's duration histograms
    * (/root/reference/monitoring/metrics.go:13-17) scrapes first.
    * Reference buckets (1 ms–1 s). */
  val batchDuration = new PromHistogram(
    "graft_batch_duration_seconds",
    "Micro-batch wall-clock duration (trigger to commit)")

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    startedAtMs.compareAndSet(0, System.currentTimeMillis())

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    rowsProcessed.addAndGet(event.progress.numInputRows)
    batchesProcessed.incrementAndGet()
    batchDuration.observeMillis(event.progress.batchDuration)
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
    val rt = Runtime.getRuntime
    s"""graft_ticks_processed_total ${rowsProcessed.get}
       |graft_batches_processed_total ${batchesProcessed.get}
       |graft_query_errors_total ${queryErrors.get}
       |graft_uptime_millis $uptime
       |graft_last_progress_epoch_ms ${lastProgressEpochMs.get}
       |graft_memory_used_bytes ${rt.totalMemory - rt.freeMemory}
       |${batchDuration.exposition}
       |${PipelineMetrics.gateDuration.exposition}""".stripMargin
  }
}

/** Process-wide curation-gate latency — observed by
  * `CurationPipeline.processBatch` (driver-side, one observation per
  * gate pass), exposed through every MetricsHttpServer. A singleton
  * because the pipeline runs inside foreachBatch, far from any
  * listener instance; histograms are additive so shared state is the
  * correct aggregation. */
object PipelineMetrics {
  val gateDuration = new PromHistogram(
    "graft_gate_duration_seconds",
    "Curation gate (dedup/near-dup) wall-clock per micro-batch")
}
