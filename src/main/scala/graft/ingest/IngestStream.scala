package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest pipeline (SURVEY §3.1): frames -> decode -> broadcast
  * enrichment -> 5 s micro-batch Parquet append with checkpointing.
  *
  * Implements the reference's *documented* batch semantics
  * (/root/reference/README.md:116-117: 1000-row batches, 5 s flush) with
  * Structured Streaming — Trigger.ProcessingTime("5 seconds") +
  * foreachBatch append. Delivery upgrades from the reference's
  * drop-on-full at-most-once (/root/reference/main.go:325-330) to
  * effectively exactly-once: the sink write is IDEMPOTENT per micro-batch
  * (each batch dynamically overwrites its own (trade_date, batch_id)
  * partitions, so a batch replayed after a crash-between-write-and-commit
  * replaces itself instead of duplicating), and the (token,
  * sequence_number) dedup in Bars covers source-side redelivery.
  *
  * Scale: the sink is date-partitioned and sorted within partitions by
  * event time, approximating the reference's MergeTree ORDER BY timestamp
  * (/root/reference/db/clickhouse.go:26-27) — time-range queries prune
  * partitions, then row groups via min/max stats.
  */
object IngestStream {

  /** Wire the pipeline: returns the started query. `frames` is any
    * streaming Dataset of raw frames (MemoryStream in tests; a Kafka or
    * file source in production — the reconnect/backoff logic of the
    * reference's WS client is subsumed by source retry + checkpoint). */
  def start(
      spark: SparkSession,
      frames: Dataset[Array[Byte]],
      tokenDim: DataFrame,
      sinkDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    val ticks = TickDecoder.decode(spark, frames)
    val enriched = TokenDirectory.enrich(ticks.toDF(), tokenDim)
    enriched.writeStream
      .queryName("graft-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.storage.TickTable.appendBatch(batch, sinkDir, batchId)
      }
      .start()
  }

  /** K4 debug sink: decoded ticks to the console (the reference's
    * per-tick log line, /root/reference/main.go:158-162). */
  def startConsole(
      spark: SparkSession,
      frames: Dataset[Array[Byte]],
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    TickDecoder.decode(spark, frames).toDF()
      .writeStream
      .queryName("graft-ingest-console")
      .format("console")
      .option("truncate", "false")
      .trigger(trigger)
      .start()

  /** The reference's periodic self-verification queries
    * (/root/reference/db/clickhouse.go:122-187), re-expressed over the
    * sink table: latest row + daily stats for a token. */
  def verifyLastInserted(spark: SparkSession, sinkDir: String, token: String): DataFrame =
    spark.read.parquet(sinkDir)
      .filter(col("token") === token)
      .orderBy(col("exchange_timestamp").desc, col("sequence_number").desc)
      .limit(1)

  def dailyStats(spark: SparkSession, sinkDir: String, token: String): DataFrame =
    spark.read.parquet(sinkDir)
      .filter(col("token") === token)
      .groupBy(to_date(col("exchange_timestamp")).as("trade_date"))
      .agg(
        // reference parity: session extremes, not captured-LTP extremes
        // (/root/reference/db/clickhouse.go:159-162); LTP frames fall back
        min(coalesce(col("low_price"), col("last_traded_price"))).as("low_price"),
        max(coalesce(col("high_price"), col("last_traded_price"))).as("high_price"),
        sum("volume").as("total_volume"),
        count(lit(1)).as("tick_count"))
      .orderBy(col("trade_date").desc)
}
