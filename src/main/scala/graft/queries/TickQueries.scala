package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Schemas

/** The reference's query surface over the REAL tick schema
  * (graft.core.Schemas.tickSchema) — what a user of the reference runs
  * today, verbatim in semantics, against tables produced by the ingest
  * pipeline (graft.ingest.IngestStream / graft.storage.TickTable).
  *
  * MarketQueries carries the same queries over the driver's `events`
  * fixture for the DuckDB oracle gate; this module is the
  * production-schema API, exercised end-to-end in TickQueriesSpec via
  * the streaming sink.
  */
object TickQueries {

  /** SELECT * WHERE token ORDER BY ts DESC LIMIT 1
    * (/root/reference/db/clickhouse.go:123-132). */
  def latestTick(ticks: DataFrame, token: String): DataFrame =
    ticks.filter(col("token") === token)
      .orderBy(col("exchange_timestamp").desc, col("sequence_number").desc)
      .limit(1)

  /** Daily stats per token (/root/reference/db/clickhouse.go:156-169):
    * the reference aggregates the EXCHANGE-PROVIDED session extremes
    * (min(low_price)/max(high_price)), not the captured LTPs — an LTP-mode
    * frame carries no session fields, so fall back to its trade price. */
  def dailyStats(ticks: DataFrame, token: String): DataFrame =
    ticks.filter(col("token") === token)
      .groupBy(to_date(col("exchange_timestamp")).as("trade_date"))
      .agg(
        min(coalesce(col("low_price"), col("last_traded_price"))).as("low_price"),
        max(coalesce(col("high_price"), col("last_traded_price"))).as("high_price"),
        sum("volume").as("total_volume"),
        count(lit(1)).as("tick_count"))
      .orderBy(col("trade_date").desc)

  /** Freshness for a token watch-list
    * (/root/reference/db/clickhouse.go:191-199). */
  def tokenFreshness(ticks: DataFrame, tokens: Seq[String]): DataFrame =
    ticks.filter(col("token").isin(tokens: _*))
      .groupBy("token")
      .agg(max(col("exchange_timestamp")).as("last_ts"), count(lit(1)).as("tick_count"))
      .orderBy("token")

  /** Latest k prices for a token set (/root/reference/README.md:219-227). */
  def latestPrices(ticks: DataFrame, tokens: Seq[String], k: Int = 10): DataFrame =
    ticks.filter(col("token").isin(tokens: _*))
      .orderBy(col("exchange_timestamp").desc, col("sequence_number").desc)
      .limit(k)
      .select("token", "symbol", "exchange_timestamp", "last_traded_price", "volume")

  /** Daily OHLCV (/root/reference/README.md:231-243) with deterministic
    * first/last via min_by/max_by over (ts, seq) — SURVEY §2.5 A3. */
  def dailyOhlcv(ticks: DataFrame, token: String): DataFrame =
    ticks.filter(col("token") === token)
      .groupBy(to_date(col("exchange_timestamp")).as("trade_date"))
      .agg(
        min_by(col("last_traded_price"), struct(col("exchange_timestamp"), col("sequence_number"))).as("open_price"),
        max("high_price").as("high_price"),
        min("low_price").as("low_price"),
        max_by(col("last_traded_price"), struct(col("exchange_timestamp"), col("sequence_number"))).as("close_price"),
        sum("volume").as("total_volume"),
        count(lit(1)).as("tick_count"))
      .orderBy(col("trade_date").desc)

  /** Volume profile over the trailing window
    * (/root/reference/README.md:247-256), as-of parameterized
    * (SURVEY §7.4.3 — never wall-clock inside the query). */
  def volumeProfile(ticks: DataFrame, token: String, asOf: String, days: Int = 7): DataFrame =
    ticks.filter(col("token") === token
        && col("exchange_timestamp") >= to_timestamp(lit(asOf)) - expr(s"INTERVAL $days DAYS"))
      .groupBy(round(col("last_traded_price"), 2).as("price_level"))
      .agg(count(lit(1)).as("tick_count"), sum("volume").as("total_volume"))
      .orderBy(col("price_level").desc)

  /** As-of join on the tick schema: latest price at-or-before `asOf`
    * per watched token (one max_by hash agg, no window shuffle). */
  def asofPrice(ticks: DataFrame, tokens: Seq[String], asOf: String): DataFrame =
    ticks.filter(col("token").isin(tokens: _*)
        && col("exchange_timestamp") <= to_timestamp(lit(asOf)))
      .groupBy("token")
      .agg(
        max_by(col("last_traded_price"), struct(col("exchange_timestamp"), col("sequence_number"))).as("asof_price"),
        max("exchange_timestamp").as("asof_ts"))
      .orderBy("token")

  /** Order-book imbalance from decoded mode-4 frames (the best-five depth
    * superset — Codec scaladoc; the reference declares Depth but never
    * decodes it): per token, total best-five buy vs sell quantity and the
    * normalized imbalance in [-1, 1]. All ladder math is plan-side
    * `aggregate` over the nested array<struct> — no UDF, one hash agg. */
  def depthImbalance(frames: Dataset[Schemas.TickFrame]): DataFrame = {
    def sideQty(side: String) =
      aggregate(col(s"depth.$side"), lit(0L), (acc, x) => acc + x.getField("quantity"))
    frames.toDF()
      .filter(col("depth").isNotNull)
      .select(col("token"), sideQty("buy").as("buy_qty"), sideQty("sell").as("sell_qty"))
      .groupBy("token")
      .agg(sum("buy_qty").as("total_buy_qty"), sum("sell_qty").as("total_sell_qty"))
      .withColumn("imbalance",
        round((col("total_buy_qty") - col("total_sell_qty")).cast("double") /
          greatest(col("total_buy_qty") + col("total_sell_qty"), lit(1L)), 6))
      .orderBy("token")
  }

  /** Per-token stats record (/root/reference/models/stats.go:5-13). */
  def tokenStats(ticks: DataFrame): DataFrame =
    ticks.groupBy("token")
      .agg(
        min("last_traded_price").as("min_price"),
        max("last_traded_price").as("max_price"),
        avg("last_traded_price").as("avg_price"),
        sum("volume").as("total_volume"),
        count(lit(1)).as("tick_count"),
        max("exchange_timestamp").as("last_update"))
      .orderBy("token")
}
