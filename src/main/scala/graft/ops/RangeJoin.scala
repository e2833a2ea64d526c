package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows to interval rows sharing a key,
  * with point ∈ [start, end] (inclusive). Spark has no native range-join
  * operator — a bare range predicate plans as a nested-loop join, the
  * all-pairs shape PlanSpec bans. Two scale-safe formulations instead:
  *
  *  - `pointInInterval`: equality-join on the key, filter the range.
  *    Per-key cost |points_k| × |intervals_k| — right when intervals per
  *    key are bounded (sessions per user, versions per entity).
  *  - `pointInIntervalBucketed`: explode each interval into the coarse
  *    time buckets it spans; points join on (key, bucket) — each point
  *    joins only its own bucket's intervals, bounding fan-out by bucket
  *    occupancy instead of per-key interval count. The standard banding
  *    trick when a key's interval list is unbounded (the same shape as
  *    the LSH band join in TextDedup).
  *
  * Both emit one row per matching (point, interval) pair; a point in no
  * interval is dropped (inner semantics). */
object RangeJoin {

  /** `points` carries (key, ts, ...); `intervals` carries
    * (key, startCol, endCol, ...). Columns must be disjoint apart from
    * the key. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      key: String, pointTs: String, startTs: String, endTs: String): DataFrame =
    points.join(intervals, Seq(key))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))

  /** Bucketized variant: `bucketWidth` in the same units as the ts
    * columns (e.g. micros). Each interval appears once per bucket it
    * spans; each point probes exactly one (key, bucket) group, so the
    * pair appears at most once — no dedup needed. */
  def pointInIntervalBucketed(
      points: DataFrame, intervals: DataFrame,
      key: String, pointTs: String, startTs: String, endTs: String,
      bucketWidth: Long): DataFrame = {
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth))
    val bucketed = intervals.withColumn("_bkt",
      explode(sequence(bucketOf(col(startTs)), bucketOf(col(endTs)))))
    points
      .withColumn("_bkt", bucketOf(col(pointTs)))
      .join(bucketed, Seq(key, "_bkt"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("_bkt")
  }
}
