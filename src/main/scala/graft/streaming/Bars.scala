package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time OHLCV bars — the semantics upgrade over the reference
  * (SURVEY §0.1.2-3): the reference stamps rows with processing time
  * (/root/reference/main.go:138) and drops the decoded sequence number and
  * exchange timestamp (/root/reference/parser/binary.go:59-60); we key
  * windows on event time, bound state with a watermark, and collapse
  * redeliveries on (token, sequence_number).
  *
  * Works on both streaming and batch DataFrames with the tick schema
  * (graft.core.Schemas.tickSchema).
  */
object Bars {

  /** Tumbling OHLCV bars on event time, any width.
    *
    * @param watermark how late a tick may arrive before its bar closes;
    *   state for closed windows is dropped (bounded memory at any scale).
    */
  def tumbling(ticks: DataFrame, width: String, watermark: String): DataFrame = {
    val deduped = ticks
      .withWatermark("exchange_timestamp", watermark)
      .dropDuplicatesWithinWatermark("token", "sequence_number")
    deduped
      .groupBy(window(col("exchange_timestamp"), width), col("token"))
      .agg(
        min_by(col("last_traded_price"), struct(col("exchange_timestamp"), col("sequence_number"))).as("open_price"),
        max("last_traded_price").as("high_price"),
        min("last_traded_price").as("low_price"),
        max_by(col("last_traded_price"), struct(col("exchange_timestamp"), col("sequence_number"))).as("close_price"),
        sum("last_traded_quantity").as("bar_volume"),
        count(lit(1)).as("tick_count"))
      .select(col("window.start").as("bar_start"), col("token"),
        col("open_price"), col("high_price"), col("low_price"),
        col("close_price"), col("bar_volume"), col("tick_count"))
  }

  /** The reference-parity default: 1-minute bars (the minute bucketing
    * hinted at by /root/reference/main.go:121-122). */
  def oneMinute(ticks: DataFrame, watermark: String = "1 minute"): DataFrame =
    tumbling(ticks, "1 minute", watermark)

  /** Session-window trade bursts: ticks within `gap` of each other merge
    * into one session per token (built-in session_window state — merges
    * windows as late-but-in-watermark ticks bridge gaps). */
  def sessions(ticks: DataFrame, gap: String = "5 minutes",
               watermark: String = "1 minute"): DataFrame =
    ticks
      .withWatermark("exchange_timestamp", watermark)
      .dropDuplicatesWithinWatermark("token", "sequence_number")
      .groupBy(session_window(col("exchange_timestamp"), gap), col("token"))
      .agg(
        min("last_traded_price").as("low_price"),
        max("last_traded_price").as("high_price"),
        sum("last_traded_quantity").as("session_volume"),
        count(lit(1)).as("tick_count"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("token"),
        col("low_price"), col("high_price"), col("session_volume"), col("tick_count"))
}
