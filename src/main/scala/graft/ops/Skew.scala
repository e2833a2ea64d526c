package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys (SURVEY §7.4.6 / the 100 TB
  * posture). AQE's skew-join splitting covers joins; for aggregations
  * with pathological key skew (one token = half the stream), two-phase
  * salted aggregation bounds any single reducer's input at
  * 1/saltBuckets of the hot key.
  */
object Skew {

  /** Two-phase salted sum/count aggregation:
    * phase 1 groups by (key, salt) — spreads a hot key over saltBuckets
    * reducers; phase 2 merges the partials per key. Exact same result as
    * a direct groupBy(key).agg(sum, count), any data distribution.
    */
  /** Per-row salt. Mixes a per-row id into the hash: salting on the value
    * alone collapses when the hot key's value column is CONSTANT (every
    * row hashes to one bucket — exactly the skew this operator exists to
    * spread), and spark_partition_id alone collapses when the hot key is
    * clustered into one input partition. The id varies within every
    * partition, so the spread survives both. */
  def saltCol(value: Column, saltBuckets: Int): Column =
    pmod(hash(value, monotonically_increasing_id()), lit(saltBuckets))

  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.select(
      key.as("k"),
      value.as("v"),
      saltCol(value, saltBuckets).as("salt"))
    salted
      .groupBy("k", "salt")
      .agg(sum("v").as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy("k")
      .agg(sum("partial_sum").as("total"), sum("partial_cnt").as("cnt"))
  }
}
