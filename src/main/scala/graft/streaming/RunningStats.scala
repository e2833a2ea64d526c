package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via mapGroupsWithState: per-token running statistics
  * (tick count, total volume, VWAP) that accumulate ACROSS micro-batches —
  * the stateful upgrade of the reference's process-lifetime counters
  * (/root/reference/models/stats.go:5-13, /root/reference/metrics/metrics.go:59-66),
  * which reset on restart; this state lives in the checkpointed state
  * store and survives query restarts.
  *
  * Where the built-ins stop: windowed aggs expire state at the watermark
  * and dropDuplicates holds only in-watermark keys — a RUNNING per-key
  * aggregate that must never expire needs explicit state, which is
  * exactly the mapGroupsWithState rung. State size is O(#tokens) — a
  * fixed-width record per instrument, independent of stream length.
  */
object RunningStats {

  /** Checkpointed per-token accumulator. */
  final case class TokenState(tickCount: Long, volumeSum: Long, priceVolSum: Double)

  /** One output row per token per trigger (update mode). */
  final case class TokenRunning(
      token: String, tick_count: Long, total_volume: Long, vwap: Double)

  /** Minimal input projection. Carries event time + sequence because the
    * state iterators deliver a group's rows in ARBITRARY order within a
    * micro-batch — any order-sensitive logic must sort first. */
  final case class TickLite(
      token: String, price: Double, volume: Long, tsUs: Long, seq: Long)

  private def liteOf(ticks: DataFrame) =
    ticks.select(col("token"),
      col("last_traded_price").as("price"),
      coalesce(col("volume"), lit(0L)).as("volume"),
      unix_micros(col("exchange_timestamp")).as("tsUs"),
      col("sequence_number").as("seq"))

  def update(
      token: String,
      ticks: Iterator[TickLite],
      state: GroupState[TokenState]): TokenRunning = {
    var s = state.getOption.getOrElse(TokenState(0L, 0L, 0.0))
    ticks.foreach { t =>
      s = TokenState(
        s.tickCount + 1,
        s.volumeSum + t.volume,
        s.priceVolSum + t.price * t.volume)
    }
    state.update(s)
    val vwap = if (s.volumeSum > 0) s.priceVolSum / s.volumeSum else 0.0
    TokenRunning(token, s.tickCount, s.volumeSum, vwap)
  }

  /** Attach to a (possibly streaming) tick DataFrame
    * (graft.core.Schemas.tickSchema); emits the refreshed running record
    * for every token that saw ticks in the trigger. Use with
    * OutputMode.Update. */
  def perToken(spark: SparkSession, ticks: DataFrame): Dataset[TokenRunning] = {
    import spark.implicits._
    liteOf(ticks)
      .as[TickLite]
      .groupByKey(_.token)
      .mapGroupsWithState[TokenState, TokenRunning](GroupStateTimeout.NoTimeout)(update _)
  }

  val outputMode: OutputMode = OutputMode.Update()

  // -------------------------------------------------------------------
  // flatMapGroupsWithState: 0..n outputs per key per trigger

  /** Last observed price per token (alert detector state). */
  final case class PriceState(lastPrice: Double)

  /** Emitted only when a tick moves more than `threshold` (fractional)
    * from the previously seen price for its token. */
  final case class PriceJump(
      token: String, prev_price: Double, price: Double, jump_pct: Double)

  /** Keyed anomaly detection — the flatMapGroupsWithState rung: unlike
    * mapGroupsWithState (exactly one row per key per trigger), a quiet
    * token emits NOTHING and a volatile one emits one alert per jump.
    * State is one double per token. */
  def priceJumpAlerts(
      spark: SparkSession, ticks: DataFrame, threshold: Double = 0.05): Dataset[PriceJump] = {
    import spark.implicits._
    def detect(
        token: String,
        rows: Iterator[TickLite],
        state: GroupState[PriceState]): Iterator[PriceJump] = {
      val out = Seq.newBuilder[PriceJump]
      var last = state.getOption.map(_.lastPrice)
      // the iterator order within a batch is arbitrary; jump detection is
      // order-sensitive, so impose event-time order (bounded: one group's
      // rows of one micro-batch)
      rows.toSeq.sortBy(t => (t.tsUs, t.seq)).foreach { t =>
        last.foreach { p =>
          if (p != 0.0 && math.abs(t.price - p) / p > threshold)
            out += PriceJump(token, p, t.price,
              math.rint((t.price - p) / p * 1e6) / 1e4)
        }
        last = Some(t.price)
      }
      last.foreach(p => state.update(PriceState(p)))
      out.result().iterator
    }
    liteOf(ticks)
      .as[TickLite]
      .groupByKey(_.token)
      .flatMapGroupsWithState[PriceState, PriceJump](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(detect _)
  }
}
