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

  /** Welford running-variance state: last price plus (n, mean, M2) of
    * the token's return history — fixed width per token, like every
    * state record here. */
  final case class AdaptState(lastPrice: Double, n: Long, mean: Double, m2: Double)

  final case class AdaptiveJump(token: String, price: Double, ret: Double, z: Double)

  /** ADAPTIVE anomaly bands — the streaming face of
    * MarketQueries.priceJumps' batch 3σ detector: instead of a fixed
    * percentage threshold (priceJumpAlerts), each token's alert band is
    * ±nSigma running standard deviations of ITS OWN return history,
    * maintained incrementally with Welford's algorithm in keyed state.
    * A volatile instrument needs a big move to alert; a quiet one
    * alerts on small ones — no per-instrument tuning. A return is
    * tested against the history BEFORE it is absorbed (the alert asks
    * "is this surprising given the past", and one outlier must not
    * widen the band that judges it). Warm-up: silent until `minObs`
    * returns are absorbed; σ = 0 (constant history) never alerts.
    * State is four numbers per token; within-batch rows are imposed
    * into (ts, seq) order like the fixed-threshold detector. */
  def adaptiveJumpAlerts(
      spark: SparkSession, ticks: DataFrame,
      minObs: Int = 5, nSigma: Double = 3.0): Dataset[AdaptiveJump] = {
    import spark.implicits._
    def detect(
        token: String,
        rows: Iterator[TickLite],
        state: GroupState[AdaptState]): Iterator[AdaptiveJump] = {
      val out = Seq.newBuilder[AdaptiveJump]
      var st = state.getOption
      rows.toSeq.sortBy(t => (t.tsUs, t.seq)).foreach { t =>
        st match {
          case None =>
            st = Some(AdaptState(t.price, 0L, 0.0, 0.0))
          case Some(s) =>
            val r = t.price - s.lastPrice
            if (s.n >= minObs) {
              val sd = math.sqrt(s.m2 / s.n)
              if (sd > 0.0 && math.abs(r - s.mean) > nSigma * sd)
                out += AdaptiveJump(token, t.price, r,
                  math.rint((r - s.mean) / sd * 1e4) / 1e4)
            }
            val n1 = s.n + 1
            val d = r - s.mean
            val mean1 = s.mean + d / n1
            st = Some(AdaptState(t.price, n1, mean1, s.m2 + d * (r - mean1)))
        }
      }
      st.foreach(state.update)
      out.result().iterator
    }
    liteOf(ticks)
      .as[TickLite]
      .groupByKey(_.token)
      .flatMapGroupsWithState[AdaptState, AdaptiveJump](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(detect _)
  }

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
