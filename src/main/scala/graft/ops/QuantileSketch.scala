package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — the missing third of the sketch family
  * (cardinality = HLL, frequency = CMS, quantiles = THIS): a fixed-size
  * bucket-count histogram whose quantile estimate is the upper edge of
  * the bucket where the cumulative count first reaches ceil(q*n). The
  * reference's own latency histograms (metrics/metrics.go:16, fixed
  * buckets 1 ms..1 s) are exactly this pattern; here the bucket domain
  * is data-derived per group (min/max pass) for the batch face, and
  * caller-fixed for the streaming face (a stream cannot two-pass).
  *
  * Why it matters at 100 TB: exact `percentile()` buffers every distinct
  * (value, count) of a group in ONE aggregation buffer — O(group values)
  * state on a single reducer, the classic scale-killer for low-
  * cardinality group keys over billions of rows. The sketch's state is B
  * counters per group regardless of volume, the update is `count`, and
  * the merge is `+` — a plain hash aggregate with full map-side partial
  * aggregation, and a valid streaming aggregation for free
  * (`streaming.Sketches.histogramCells`).
  *
  * Error contract: the estimate brackets the ceil(q*n)-th ORDER
  * STATISTIC x_(k) from above within one bucket width (x_(k) lies
  * inside the estimate's bucket — the type-1 / inverted-CDF quantile).
  * Against the INTERPOLATED percentile (type-7, what `percentile` /
  * `quantile_cont` return) no width bound exists: interpolation lands
  * inside the local gap between order statistics, which a heavy tail
  * makes arbitrarily wide. The batch face therefore emits the estimate
  * BESIDE the exact interpolated leg (the cmsHeavyHitters
  * self-measuring pattern) so the panel reports its OBSERVED error;
  * QuantileSketchSpec pins the provable x_(k) sandwich. A real 100 TB
  * deployment keeps only the sketch legs.
  *
  * Cross-engine determinism (ORACLE.md): lo/hi/width and the bucket id
  * are per-row IEEE arithmetic over identical inputs (rule 4 — both
  * engines floor the same double); thresholds are ceil(q*n) in int64;
  * the estimate output takes the portable round 6 and the exact legs
  * reuse the proven `percentiles` round-4 formulation.
  */
object QuantileSketch {

  val Buckets = 256
  val Quantiles: Seq[(String, Double)] =
    Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))

  /** Shared bucket assignment (batch AND streaming sides MUST bucket
    * identically, the cmsCellColumns discipline): clamp(floor((v - lo) /
    * width), 0, b-1). `width` must already carry the zero-range guard. */
  private[graft] def bucketCol(value: Column, lo: Column, width: Column,
                               b: Int): Column =
    least(lit(b - 1L), greatest(lit(0L),
      floor((value - lo) / width).cast("long")))

  /** Zero-range guard: a constant column collapses to bucket 0 instead
    * of dividing by zero. */
  private[graft] def widthCol(lo: Column, hi: Column, b: Int): Column = {
    val w0 = (hi - lo) / lit(b.toDouble)
    when(w0 === lit(0.0), lit(1.0)).otherwise(w0)
  }

  /** Batch face over the events table: per event_type, the B-bucket
    * histogram's p50/p90/p99 upper-edge estimates beside the exact
    * interpolated percentiles. Plan shape: one min/max/count aggregate
    * (broadcast back, it is group-count-sized), one bucket hash
    * aggregate with <= B rows per group surviving the partial stage, a
    * group-sized cumulative window, and the exact leg as the fixture's
    * ground truth. */
  def quantileSketch(spark: SparkSession, dir: String,
                     b: Int = Buckets): DataFrame = {
    require(b >= 2, s"need at least 2 buckets, got $b")
    val e = graft.queries.MarketQueries.events(spark, dir)
    val mm = e.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"),
        count(lit(1)).as("n"))
      .withColumn("width", widthCol(col("lo"), col("hi"), b))
    val cells = e.join(broadcast(mm), "event_type")
      .select(col("event_type"),
        bucketCol(col("value"), col("lo"), col("width"), b).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("cell"))
    val cum = cells.withColumn("cum",
      sum("cell").over(Window.partitionBy("event_type").orderBy("bucket")))
    val estAggs = Quantiles.map { case (name, q) =>
      min(when(col("cum") >= ceil(lit(q) * col("n")).cast("long"),
        col("bucket"))).as(s"b_$name")
    }
    val estBuckets = cum.join(broadcast(mm), "event_type")
      .groupBy("event_type", "lo", "width", "n")
      .agg(estAggs.head, estAggs.tail: _*)
    val exactAggs = Quantiles.map { case (name, q) =>
      round(expr(s"percentile(value, $q)"), 4).as(s"${name}_exact")
    }
    val exact = e.groupBy("event_type")
      .agg(exactAggs.head, exactAggs.tail: _*)
    val estCols = Quantiles.flatMap { case (name, _) =>
      Seq(
        TextAnalysis.round6Portable(
          col("lo") + (col(s"b_$name") + lit(1L)) * col("width"))
          .as(s"${name}_est"),
        col(s"${name}_exact"))
    }
    estBuckets.join(exact, "event_type")
      .select(col("event_type") +: col("n").as("tick_count") +: estCols: _*)
      .orderBy("event_type")
  }

  // -- adaptive (one-pass, unknown-domain) face ------------------------

  /** The log-bucket key of a double value — HDR-Histogram-style base-2
    * octave + 16 linear subbuckets, sign-mirrored, zero its own bucket
    * (plans.Log2BucketExpr: exact IEEE exponent-field arithmetic, so
    * the DuckDB oracle reproduces every key bit-for-bit from a
    * doubling-CTE power table). Relative bucket width <= 1/16: the
    * upper-edge readout is within 6.25% RELATIVE error of the
    * bracketed order statistic, with no domain pre-pass — state
    * hard-bounded at 4129 keys per group regardless of volume or
    * domain. One key definition for the batch AND streaming faces. */
  def logBucketCol(value: Column): Column =
    graft.plans.GraftExtensions.logBucket(value)

  /** Value-domain upper edge of a log-bucket key — the readout point. */
  def logBucketEdgeCol(key: Column): Column =
    graft.plans.GraftExtensions.logBucketEdge(key)

  /** ONE-PASS adaptive batch face: the same p50/p90/p99
    * estimate-beside-exact panel as [[quantileSketch]], but from the
    * log-bucket histogram — no min/max pre-pass over the data, so the
    * plan is a single scan into a hash aggregate (vs the fixed face's
    * two scans), and the SAME cells are a valid unknown-domain
    * streaming aggregation (`streaming.Sketches.logHistogramCells`).
    * Error contract: the estimate is the upper edge of the bucket
    * holding the ceil(q*n)-th order statistic x_(k) — x_(k) <= est <=
    * x_(k) * (1 + 1/16) for positive values (relative, vs the fixed
    * face's absolute one-bucket-width bound; QuantileSketchSpec pins
    * the sandwich). The exact interpolated legs ride beside as the
    * observed-error reference, as in the fixed face. */
  def quantileSketchAdaptive(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.queries.MarketQueries.events(spark, dir)
    val cells = e
      .select(col("event_type"), logBucketCol(col("value")).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("cell"))
    val cum = cells
      .withColumn("cum",
        sum("cell").over(Window.partitionBy("event_type").orderBy("bucket")))
      .withColumn("n",
        sum("cell").over(Window.partitionBy("event_type")))
    val estAggs = Quantiles.map { case (name, q) =>
      min(when(col("cum") >= ceil(lit(q) * col("n")).cast("long"),
        col("bucket"))).as(s"b_$name")
    }
    val estBuckets = cum.groupBy("event_type", "n")
      .agg(estAggs.head, estAggs.tail: _*)
    val exactAggs = Quantiles.map { case (name, q) =>
      round(expr(s"percentile(value, $q)"), 4).as(s"${name}_exact")
    }
    val exact = e.groupBy("event_type")
      .agg(exactAggs.head, exactAggs.tail: _*)
    val estCols = Quantiles.flatMap { case (name, _) =>
      Seq(
        TextAnalysis.round6Portable(logBucketEdgeCol(col(s"b_$name")))
          .as(s"${name}_est"),
        col(s"${name}_exact"))
    }
    estBuckets.join(exact, "event_type")
      .select(col("event_type") +: col("n").as("tick_count") +: estCols: _*)
      .orderBy("event_type")
  }
}
