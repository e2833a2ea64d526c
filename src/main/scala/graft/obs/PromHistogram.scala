package graft.obs

import java.util.concurrent.atomic.LongAdder

/** A fixed-bucket Prometheus histogram in the text exposition format —
  * the shape dashboards expect (`*_bucket{le="..."}` / `_sum` /
  * `_count` series), matching the reference's explicit-bucket request
  * and query duration histograms
  * (/root/reference/monitoring/metrics.go:13-17,42-47) without pulling
  * a client library into the build.
  *
  * Buckets are CUMULATIVE per the exposition spec: `le="0.05"` counts
  * every observation <= 0.05 s, and the `+Inf` bucket equals `_count`.
  * Each observe() touches one LongAdder (striped, contention-free) plus
  * a CAS-free sum accumulator — safe to call from listener threads and
  * per-batch driver code without coordination.
  *
  * Exposition holds NO lock: a scrape racing an observe may see a
  * bucket increment without the sum (or vice versa) — the standard
  * Prometheus client behavior; series are monotone so rates stay
  * correct. */
final class PromHistogram(val name: String, val help: String,
                          val buckets: Seq[Double] = PromHistogram.DefaultBuckets) {
  require(buckets == buckets.sorted && buckets.distinct == buckets,
    s"buckets must be strictly increasing: $buckets")

  // one counter per finite bucket (NON-cumulative internally; summed at
  // exposition) + count + sum-of-observations in nanos (longs, not
  // doubles: LongAdder gives striped atomicity that a double CAS loop
  // would pay for on every hot-path batch)
  private val perBucket = Array.fill(buckets.size)(new LongAdder)
  private val count = new LongAdder
  private val sumNanos = new LongAdder

  def observe(seconds: Double): Unit = {
    val i = buckets.indexWhere(seconds <= _)
    if (i >= 0) perBucket(i).increment()
    count.increment()
    sumNanos.add((seconds * 1e9).toLong)
  }

  def observeNanos(nanos: Long): Unit = observe(nanos / 1e9)
  def observeMillis(millis: Long): Unit = observe(millis / 1e3)

  def observed: Long = count.sum()

  /** Prometheus text exposition lines (no trailing newline). */
  def exposition: String = {
    val sb = new StringBuilder
    sb.append(s"# HELP $name $help\n")
    sb.append(s"# TYPE $name histogram\n")
    var cum = 0L
    def le(b: Double): String =
      if (b == b.toLong.toDouble) b.toLong.toString else b.toString
    buckets.indices.foreach { i =>
      cum += perBucket(i).sum()
      sb.append(s"""${name}_bucket{le="${le(buckets(i))}"} $cum""").append('\n')
    }
    sb.append(s"""${name}_bucket{le="+Inf"} ${count.sum()}""").append('\n')
    sb.append(s"${name}_sum ${sumNanos.sum() / 1e9}\n")
    sb.append(s"${name}_count ${count.sum()}")
    sb.toString
  }
}

object PromHistogram {
  /** The reference's request-duration buckets, 1 ms to 1 s
    * (/root/reference/monitoring/metrics.go:16). */
  val DefaultBuckets: Seq[Double] =
    Seq(0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0)
}
