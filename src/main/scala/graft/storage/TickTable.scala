package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tick-table storage layout (SURVEY §2.2 K1 + §2.6 O5): the Spark
  * equivalent of the reference's MergeTree table with ORDER BY timestamp
  * (/root/reference/db/clickhouse.go:16-28).
  *
  *  - date-partitioned parquet: time-range predicates prune whole
  *    partitions before any I/O;
  *  - sortWithinPartitions(exchange_timestamp) before write: parquet
  *    row-group min/max stats are tight, so within a day, range scans
  *    skip row groups — the same effect as the MergeTree sort key;
  *  - repartition by trade_date before the sort keeps one writer task
  *    per partition value per batch (no small-file explosion at scale).
  */
object TickTable {

  val PartitionCol = "trade_date"

  /** Append a batch of ticks (tick schema, graft.core.Schemas.tickSchema). */
  def append(ticks: DataFrame, path: String): Unit =
    ticks
      .withColumn(PartitionCol, to_date(col("exchange_timestamp")))
      .repartition(col(PartitionCol))
      .sortWithinPartitions("exchange_timestamp")
      .write.mode("append")
      .partitionBy(PartitionCol)
      .parquet(path)

  /** Idempotent micro-batch append: the layout adds a batch_id partition
    * level and the write DYNAMICALLY OVERWRITES exactly the
    * (trade_date, batch_id) partitions this batch produces — a replayed
    * batch (crash between sink write and offset commit) replaces its own
    * output instead of duplicating it. Compaction later collapses the
    * batch_id level. */
  def appendBatch(ticks: DataFrame, path: String, batchId: Long): Unit =
    ticks
      .withColumn(PartitionCol, to_date(col("exchange_timestamp")))
      .withColumn("batch_id", lit(batchId))
      .repartition(col(PartitionCol))
      .sortWithinPartitions("exchange_timestamp")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(PartitionCol, "batch_id")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compacted rows carry this batch_id in a (trade_date, batch_id)
    * layout, so re-compaction and idempotent appends coexist. */
  val CompactedBatchId = -1L

  /** Compact a date partition: micro-batch appends leave one file per
    * trigger; periodic compaction rewrites the partition into `numFiles`
    * time-sorted files. Layout-preserving: a (trade_date, batch_id) sink
    * compacts into a fresh NEGATIVE batch_id under the same structure (a
    * mixed layout would break partition discovery). At 100 TB this runs
    * as a nightly job over yesterday's partition only — never the whole
    * table.
    *
    * Crash-safe ordering: the compacted copy is written to a dot-prefixed
    * staging dir (invisible to readers), RENAMED into the table (one
    * directory rename), and only then are the old batch dirs deleted — no
    * crash window loses data. A crash between rename and deletes leaves
    * the rows visible TWICE (old + compacted); re-running
    * compactPartition for the date heals it (duplication is recoverable,
    * loss is not). */
  def compactPartition(spark: SparkSession, path: String, date: String, numFiles: Int = 1): Unit = {
    val table = read(spark, path)
    val hasBatchId = table.columns.contains("batch_id")
    val part = table.filter(col(PartitionCol) === to_date(lit(date)))
      .drop(PartitionCol, "batch_id")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val partDir = s"$path/$PartitionCol=$date"
    val staging = s"$path/.compact_stage_$date" // dot prefix: readers skip it
    part.repartition(numFiles)
      .sortWithinPartitions("exchange_timestamp")
      .write.mode("overwrite").parquet(staging)

    if (hasBatchId) {
      // fresh negative id per compaction so re-compaction never collides
      if (!fs.exists(p(partDir))) fs.mkdirs(p(partDir))
      val existing = fs.listStatus(p(partDir))
        .map(_.getPath.getName).filter(_.startsWith("batch_id="))
      val ids = existing.map(_.stripPrefix("batch_id=").toLong)
      val newId = math.min(ids.minOption.getOrElse(0L), 0L) - 1
      fs.rename(p(staging), p(s"$partDir/batch_id=$newId"))
      existing.foreach(d => fs.delete(p(s"$partDir/$d"), true))
    } else {
      val old = s"$path/.compact_old_$date"
      fs.rename(p(partDir), p(old))      // hide the old partition
      fs.rename(p(staging), p(partDir))  // publish the compacted copy
      fs.delete(p(old), true)
    }
  }

  /** Time-range scan helper — the predicate shape that gets both
    * partition pruning (on trade_date) and row-group skipping (on the
    * sorted timestamp). */
  def timeRange(spark: SparkSession, path: String, fromTs: String, toTs: String): DataFrame =
    read(spark, path)
      .filter(col(PartitionCol) >= to_date(lit(fromTs)) && col(PartitionCol) <= to_date(lit(toTs)))
      .filter(col("exchange_timestamp") >= to_timestamp(lit(fromTs))
        && col("exchange_timestamp") < to_timestamp(lit(toTs)))

  /** Save as a BUCKETED catalog table: hash-bucketed and sorted by `key`.
    * Two tables bucketed the same way join WITHOUT a shuffle — the
    * co-located fact-to-fact join (SURVEY §7.4.6; GraftConf clusterNotes:
    * "bucket very hot fact-to-fact joins by token"). At 100 TB a
    * tick-to-tick join on token shuffles the whole table every query
    * unless the layout pre-partitions it; bucketing pays that shuffle
    * once at write. StorageSpec asserts the shuffle-free join plan. */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
