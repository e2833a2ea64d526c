package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The quantile histogram's defining contracts: the estimate sandwiches
  * the true quantile from above within one bucket width, and the cell
  * table is mergeable (sum over partitions of the data == cells of the
  * whole) — the property that makes it both a valid streaming
  * aggregation and a 1000-executor partial aggregate. */
class QuantileSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("estimate sandwiches the ceil(q*n)-th order statistic within one bucket width") {
    val b = QuantileSketch.Buckets
    val rows = QuantileSketch.quantileSketch(spark, sfDir, b).collect()
    assert(rows.nonEmpty)
    // per-group sorted values (sf0.001 is tiny) — the ground truth the
    // sketch's type-1 quantile contract is stated against. No width
    // bound exists vs the INTERPOLATED exact leg: interpolation lands in
    // the gap between order statistics, which a heavy tail widens past
    // any bucket (observed: p99 gap 91 >> width 1.28 at sf0.001).
    val byType = graft.queries.MarketQueries.events(spark, sfDir)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for (r <- rows; q <- Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))) {
      val (name, qv) = q
      val est = r.getAs[Double](s"${name}_est")
      val vals = byType(r.getString(0))
      val n = vals.length
      val lo = vals.head; val hi = vals.last
      val w0 = (hi - lo) / b
      val w = if (w0 == 0) 1.0 else w0
      val xk = vals(math.ceil(qv * n).toInt - 1)
      assert(est >= xk - 1e-4,
        s"${r.getString(0)} $name: estimate $est must be >= x_(ceil(qn)) $xk")
      assert(est - xk <= w + 1e-4,
        s"${r.getString(0)} $name: overshoot ${est - xk} must be <= width $w")
    }
  }

  test("cell table is mergeable: per-slice cells sum to whole-data cells") {
    import spark.implicits._
    val b = 32
    val e = graft.queries.MarketQueries.events(spark, sfDir)
      .select("event_type", "value", "event_id")
    // fixed domain so slices bucket identically (the streaming contract)
    val lo = 0.0
    val width = (500.0 - lo) / b
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"),
        QuantileSketch.bucketCol(col("value"), lit(lo), lit(width), b).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("cell"))
      .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val whole = cells(e)
    val sliceA = cells(e.filter(col("event_id") % 2 === 0))
    val sliceB = cells(e.filter(col("event_id") % 2 =!= 0))
    val merged = (sliceA.keySet ++ sliceB.keySet).map { k =>
      k -> (sliceA.getOrElse(k, 0L) + sliceB.getOrElse(k, 0L))
    }.toMap
    assert(merged === whole)
  }

  test("adaptive estimate sandwiches x_(k) within 1/16 RELATIVE error (no domain pre-pass)") {
    val rows = QuantileSketch.quantileSketchAdaptive(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = graft.queries.MarketQueries.events(spark, sfDir)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for (r <- rows; q <- Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))) {
      val (name, qv) = q
      val est = r.getAs[Double](s"${name}_est")
      val vals = byType(r.getString(0))
      val xk = vals(math.ceil(qv * vals.length).toInt - 1)
      // upper-edge readout: x_(k) lives in the estimate's bucket, so
      // est > x_(k) and est <= lowerEdge * 17/16 <= x_(k) * 17/16
      // (round6Portable moves the edge < 1e-6, covered by the slack)
      assert(est >= xk - 1e-4,
        s"${r.getString(0)} $name: estimate $est must be >= x_(ceil(qn)) $xk")
      assert(est <= xk * (17.0 / 16.0) + 1e-4,
        s"${r.getString(0)} $name: $est exceeds the 1/16 relative bound over $xk")
    }
  }

  test("log-bucket key: monotone, sign-mirrored, saturating; edge brackets the value") {
    import spark.implicits._
    val vals = Seq(-1e30, -4.2e3, -1.0, -3e-21, 0.0, 5.4e-20, 0.01, 0.99,
      1.0, 1.0625, 1.5, 2.0, 490.02, 1e6, 3.6e19, 1e30)
    val keyed = vals.toDF("value")
      .select(col("value"), QuantileSketch.logBucketCol(col("value")).as("k"))
      .select(col("value"), col("k"),
        QuantileSketch.logBucketEdgeCol(col("k")).as("edge"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    val byVal = keyed.map(t => t._1 -> t._2).toMap
    // strictly ascending VALUES map to non-decreasing keys across 60
    // orders of magnitude — the property that makes cum-over-key a CDF
    val keysInOrder = vals.sorted.map(byVal)
    assert(keysInOrder === keysInOrder.sorted, s"keys not monotone: $keyed")
    assert(byVal(0.0) === 0L)
    // sign mirror: key(-v) == -key(v)
    assert(byVal(-1.0) === -byVal(1.0))
    assert(byVal(-1e30) === -byVal(1e30))
    // saturation: |v| < 2^-64 -> bottom key 17; |v| >= 2^65 -> top 2080
    assert(byVal(-3e-21) === -17L && byVal(1e30) === 2080L
      && byVal(3.6e19) === 2080L && byVal(-1e30) === -2080L)
    assert(byVal(5.4e-20) === 17L || byVal(5.4e-20) === 18L) // just above 2^-64
    // exact octave boundaries land in the right bucket: key(1.0) opens
    // the e=0 octave, key(2.0) the e=1 octave, 1.0625 = 1 + 1/16 the
    // second subbucket
    assert(byVal(1.0) === (0 + 65) * 16 + 1L)
    assert(byVal(1.0625) === (0 + 65) * 16 + 2L)
    assert(byVal(2.0) === (1 + 65) * 16 + 1L)
    // edge brackets: v < edge(key(v)) <= v * 17/16 for in-range positives
    for ((v, _, edge) <- keyed if v > 5.5e-20 && v < 3.6e19) {
      assert(edge > v && edge <= v * (17.0 / 16.0),
        s"edge $edge must bracket $v within 1/16 relative")
    }
    // mergeable with NO shared domain parameters: per-slice cells sum to
    // whole-data cells (the streaming/1000-executor contract, now
    // without any [lo, hi) coordination)
    val e = graft.queries.MarketQueries.events(spark, sfDir)
      .select("event_type", "value", "event_id")
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), QuantileSketch.logBucketCol(col("value")).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("cell"))
      .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val whole = cells(e)
    val sliceA = cells(e.filter(col("event_id") % 2 === 0))
    val sliceB = cells(e.filter(col("event_id") % 2 =!= 0))
    val merged = (sliceA.keySet ++ sliceB.keySet).map { k =>
      k -> (sliceA.getOrElse(k, 0L) + sliceB.getOrElse(k, 0L))
    }.toMap
    assert(merged === whole)
  }

  test("constant-value group collapses to bucket 0 instead of dividing by zero") {
    import spark.implicits._
    val df = Seq.fill(10)(("flat", 42.0)).toDF("event_type", "value")
    val mm = df.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .withColumn("width", QuantileSketch.widthCol(col("lo"), col("hi"), 256))
    val cells = df.join(mm, "event_type")
      .select(QuantileSketch.bucketCol(col("value"), col("lo"), col("width"), 256)
        .as("bucket"))
      .groupBy("bucket").count().collect()
    assert(cells.length === 1 && cells(0).getLong(0) === 0L
      && cells(0).getLong(1) === 10L)
  }
}
