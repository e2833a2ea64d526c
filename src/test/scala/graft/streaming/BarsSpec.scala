package graft.streaming

import graft.SparkSpec
import graft.core.Schemas.Tick
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

/** Event-time bar semantics (FIXTURES.md §5 scripts 1-3): happy path,
  * duplicate collapse within watermark, late-data drop; plus custom keyed
  * state (mapGroupsWithState) accumulating across micro-batches. */
class BarsSpec extends SparkSpec {

  private val T0 = 1704447000000L // 2024-01-05 09:30:00 UTC, minute-aligned

  private def tick(token: String, seq: Long, tsMs: Long, price: Double): Tick =
    Tick(token, Some("SYM"), 1, 2, seq,
      new Timestamp(tsMs), new Timestamp(tsMs),
      price, Some(1L), Some(price), Some(price), Some(price), Some(price),
      Some(price), Some(100L), Some(1.0), Some(1.0))

  test("1-min bars: OHLC by event time, dup collapse, late rows dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Tick]
    val bars = Bars.oneMinute(stream.toDF(), watermark = "1 minute")
    val q = bars.writeStream
      .format("memory").queryName("bars_test").outputMode("append").start()

    // minute-0 ticks for token A, with one exact redelivery (seq 2 twice)
    stream.addData(
      tick("A", 1, T0 + 10000, 100.0),
      tick("A", 2, T0 + 20000, 105.0),
      tick("A", 2, T0 + 20000, 105.0), // duplicate (token, seq)
      tick("A", 3, T0 + 40000, 95.0))
    q.processAllAvailable()

    // advance the watermark past minute 0: event at +5 min
    stream.addData(tick("A", 10, T0 + 300000, 110.0))
    q.processAllAvailable()

    val closed = spark.table("bars_test").collect()
    assert(closed.length === 1, "exactly the minute-0 bar must have closed")
    val bar = closed(0)
    assert(bar.getAs[Timestamp]("bar_start").getTime === T0)
    assert(bar.getAs[Double]("open_price") === 100.0)
    assert(bar.getAs[Double]("high_price") === 105.0)
    assert(bar.getAs[Double]("low_price") === 95.0)
    assert(bar.getAs[Double]("close_price") === 95.0)
    assert(bar.getAs[Long]("tick_count") === 3L, "duplicate must collapse")

    // late arrival into the already-closed minute-0 window: dropped
    stream.addData(tick("A", 4, T0 + 30000, 1.0))
    // push watermark far ahead so minute-5 also closes
    stream.addData(tick("A", 11, T0 + 600000, 111.0))
    q.processAllAvailable()
    q.stop()

    val after = spark.table("bars_test").collect()
    val minute0 = after.filter(_.getAs[Timestamp]("bar_start").getTime == T0)
    assert(minute0.length === 1, "closed window must not re-emit")
    assert(minute0(0).getAs[Double]("low_price") === 95.0,
      "late 1.0 tick must not have entered the closed bar")
    // the +5 min window closed with exactly its one (non-late) tick
    val minute5 = after.filter(_.getAs[Timestamp]("bar_start").getTime == T0 + 300000)
    assert(minute5.length === 1 && minute5(0).getAs[Long]("tick_count") === 1L)
  }

  // Pins the engine boundary rule MarketQueries.sessionWindowAgg's oracle
  // mirrors: the point-event window [ts, ts+gap] merges INCLUSIVELY, so an
  // event landing exactly gap after its predecessor still EXTENDS the
  // session (a first draft of the oracle assumed exclusive `>=` splitting;
  // THIS fixture is what falsified it — the sf0.01/sf0.1 corpora contain no
  // boundary-exact pair, so the hash gate alone could not tell the rules
  // apart), a gap+1us event starts a new one, and a session's end is its
  // last event's ts + gap. The lag-recipe equivalent is sessionStats' own
  // `diff > gap` predicate.
  test("batch session_window boundary: gap-equal event merges, gap+1us splits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gapUs = 4L * 3600 * 1000000 // 4 hours in micros
    val t0 = 1704447000000000L
    val df = Seq(
      (1L, t0), (1L, t0 + gapUs),     // exactly gap apart -> still ONE session
      (2L, t0), (2L, t0 + gapUs + 1)  // 1 us past the gap -> splits
    ).toDF("user_id", "ts_us").withColumn("ts", timestamp_micros(col("ts_us")))
    val out = df.groupBy(col("user_id"), session_window(col("ts"), "4 hours"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("s"),
        unix_micros(col("session_window.end")).as("e"), col("n"))
      .collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.length === 1, "exact-gap event must extend the session (inclusive merge)")
    assert(u1(0).getAs[Long]("n") === 2L)
    assert(u1(0).getAs[Long]("e") === t0 + gapUs + gapUs, "end = last event ts + gap")
    val u2 = out.filter(_.getLong(0) == 2L).sortBy(_.getAs[Long]("s"))
    assert(u2.length === 2, "one microsecond past the gap must split")
    assert(u2(0).getAs[Long]("n") === 1L)
    assert(u2(0).getAs[Long]("e") === t0 + gapUs)
  }

  test("session windows: ticks merge across small gaps, split at large ones") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.core.Schemas.Tick]
    val q = Bars.sessions(stream.toDF(), gap = "2 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions_test").outputMode("append").start()

    // burst 1: three ticks 1 min apart (inside the 2-min gap -> one session)
    stream.addData(
      tick("A", 1, T0, 100.0),
      tick("A", 2, T0 + 60000, 101.0),
      tick("A", 3, T0 + 120000, 102.0))
    // burst 2: after a 10-minute silence -> separate session
    stream.addData(tick("A", 10, T0 + 720000, 110.0))
    q.processAllAvailable()
    // advance the watermark far enough to close both sessions
    stream.addData(tick("A", 20, T0 + 3600000, 120.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions_test").collect()
      .sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
    assert(sessions.length === 2)
    assert(sessions(0).getAs[Long]("tick_count") === 3L, "burst 1 merges into one session")
    assert(sessions(0).getAs[Double]("high_price") === 102.0)
    assert(sessions(1).getAs[Long]("tick_count") === 1L, "burst 2 is its own session")
  }

  test("session windows: a later batch's tick MERGES two pending sessions; gap closes state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.core.Schemas.Tick]
    val q = Bars.sessions(stream.toDF(), gap = "2 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_merge_test")
      .outputMode("append").start()

    // batch 1: two ticks 3 min apart — FURTHER than the 2-min gap, so
    // the state store holds two separate pending sessions
    stream.addData(
      tick("A", 1, T0, 100.0),
      tick("A", 2, T0 + 180000, 104.0))
    q.processAllAvailable()
    // batch 2: a tick BETWEEN them (in-watermark) bridges the gap —
    // session_window state must MERGE the two pending sessions into one
    stream.addData(tick("A", 3, T0 + 90000, 102.0))
    q.processAllAvailable()
    // advance the watermark far enough to close (gap-close: the merged
    // session emits once its end + gap falls behind the watermark)
    stream.addData(tick("A", 20, T0 + 7200000, 120.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions_merge_test").collect()
      .sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
    assert(sessions.length === 1, s"bridged bursts must emit ONE merged session: ${sessions.toSeq}")
    assert(sessions(0).getAs[Long]("tick_count") === 3L,
      "the merged session must contain both batches' ticks plus the bridge")
    assert(sessions(0).getAs[Double]("low_price") === 100.0)
    assert(sessions(0).getAs[Double]("high_price") === 104.0)
    assert(sessions(0).getAs[java.sql.Timestamp]("session_start").getTime === T0,
      "merged session must span from the first burst's start")
  }

  test("running stats: custom keyed state accumulates across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Tick]
    val q = RunningStats.perToken(spark, stream.toDF())
      .writeStream.format("memory").queryName("running_test")
      .outputMode(RunningStats.outputMode).start()

    // batch 1: two A ticks, one B tick
    stream.addData(
      tick("A", 1, T0, 100.0).copy(volume = Some(10L)),
      tick("A", 2, T0 + 1000, 200.0).copy(volume = Some(30L)),
      tick("B", 1, T0, 50.0).copy(volume = Some(5L)))
    q.processAllAvailable()
    // batch 2: one more A tick — state must carry batch 1 forward
    stream.addData(tick("A", 3, T0 + 2000, 300.0).copy(volume = Some(60L)))
    q.processAllAvailable()
    q.stop()

    // update mode emits one row per key per trigger; the LAST A row has
    // the accumulated totals
    val rows = spark.table("running_test").collect()
    val lastA = rows.filter(_.getAs[String]("token") == "A")
      .maxBy(_.getAs[Long]("tick_count"))
    assert(lastA.getAs[Long]("tick_count") === 3L, "state must survive across batches")
    assert(lastA.getAs[Long]("total_volume") === 100L)
    // vwap = (100*10 + 200*30 + 300*60) / 100 = 250.0
    assert(lastA.getAs[Double]("vwap") === 250.0)
    val lastB = rows.filter(_.getAs[String]("token") == "B").maxBy(_.getAs[Long]("tick_count"))
    assert(lastB.getAs[Long]("tick_count") === 1L)
    assert(lastB.getAs[Double]("vwap") === 50.0)
  }

  test("running stats state survives a query restart from checkpoint") {
    import spark.implicits._
    import graft.core.Codec
    import graft.core.Schemas.TickFrame
    import graft.sources.FrameSpool
    val ckpt = java.nio.file.Files.createTempDirectory("rsckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("rssink").toString
    val spool = java.nio.file.Files.createTempDirectory("rsspool").toString

    def frame(seq: Long, ltpPaise: Long, vol: Long): Array[Byte] =
      Codec.encode(TickFrame(2, 1, "A", seq, T0 + seq * 1000, ltpPaise,
        Some(1L), Some(ltpPaise), Some(vol), Some(1.0), Some(1.0),
        Some(ltpPaise), Some(ltpPaise), Some(ltpPaise), Some(ltpPaise)))

    // replayable source (MemoryStream offsets don't survive a restart):
    // the spool grows between runs, the checkpoint resumes mid-spool
    def runSpool(): Unit = {
      val frames = spark.readStream
        .format("graft.sources.FrameReplayProvider")
        .option("path", spool).load()
        .select("payload").as[Array[Byte]]
      val ticks = graft.ingest.TickDecoder.decode(spark, frames).toDF()
      val q = RunningStats.perToken(spark, ticks)
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode(RunningStats.outputMode)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[RunningStats.TokenRunning], _: Long) =>
          b.write.mode("append").parquet(sink)
        }.start()
      q.processAllAvailable()
      q.stop()
    }

    FrameSpool.write(spool, Seq(frame(1, 10000L, 10L)), "a") // 100.0 x 10
    runSpool()
    FrameSpool.write(spool, Seq(frame(2, 20000L, 30L)), "b") // 200.0 x 30
    runSpool() // NEW query, same checkpoint: state must restore

    val last = spark.read.parquet(sink)
      .filter(col("token") === "A")
      .orderBy(col("tick_count").desc).limit(1).collect()(0)
    assert(last.getAs[Long]("tick_count") === 2L,
      "restarted query must resume from checkpointed state, not from zero")
    assert(last.getAs[Long]("total_volume") === 40L)
    // vwap = (100*10 + 200*30) / 40 = 175.0
    assert(last.getAs[Double]("vwap") === 175.0)
  }

  test("price-jump alerts: flatMapGroupsWithState emits only on anomalies") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Tick]
    val q = RunningStats.priceJumpAlerts(spark, stream.toDF(), threshold = 0.05)
      .writeStream.format("memory").queryName("alerts_test")
      .outputMode("append").start()

    stream.addData(tick("A", 1, T0, 100.0), tick("B", 1, T0, 50.0))
    q.processAllAvailable() // first observations: no alerts
    stream.addData(tick("A", 2, T0 + 1000, 102.0), tick("B", 2, T0 + 1000, 50.5))
    q.processAllAvailable() // 2% and 1% moves: quiet
    stream.addData(tick("A", 3, T0 + 2000, 120.0))
    q.processAllAvailable() // 17.6% jump vs state carried from batch 2
    // one batch with rows ADDED out of event-time order: the detector
    // must evaluate in (ts, seq) order — 120 -> 119 quiet, 119 -> 200 jump
    stream.addData(tick("A", 5, T0 + 5000, 200.0), tick("A", 4, T0 + 4000, 119.0))
    q.processAllAvailable()
    q.stop()

    val alerts = spark.table("alerts_test").collect()
      .sortBy(_.getAs[Double]("price"))
    assert(alerts.length === 2, "only the >5% moves may alert")
    val a = alerts(0)
    assert(a.getAs[String]("token") === "A")
    assert(a.getAs[Double]("prev_price") === 102.0, "state must span batches")
    assert(a.getAs[Double]("price") === 120.0)
    assert(math.abs(a.getAs[Double]("jump_pct") - 17.6471) < 1e-4)
    val b = alerts(1)
    assert(b.getAs[Double]("prev_price") === 119.0,
      "within-batch rows must be processed in event-time order")
    assert(b.getAs[Double]("price") === 200.0)
  }

  test("adaptive jump alerts: per-token Welford bands, warm-up silence, cross-batch state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Tick]
    val q = RunningStats.adaptiveJumpAlerts(spark, stream.toDF(), minObs = 5)
      .writeStream.format("memory").queryName("adaptive_alerts_test")
      .outputMode("append").start()

    // token A: alternating +/-1 returns (sd ~ 1), then a +10 outlier;
    // token B: constant price (sd = 0) must NEVER alert
    val pricesA = Seq(100.0, 101.0, 100.0, 101.0, 100.0, 101.0)
    pricesA.zipWithIndex.foreach { case (p, i) =>
      stream.addData(tick("A", i + 1, T0 + i * 1000, p))
      stream.addData(tick("B", i + 1, T0 + i * 1000, 50.0))
    }
    q.processAllAvailable() // five returns absorbed: warm-up, silent
    assert(spark.table("adaptive_alerts_test").isEmpty,
      "warm-up and in-band moves must stay silent")
    // the outlier arrives in a LATER batch: state must span batches
    stream.addData(tick("A", 7, T0 + 6000, 111.0), tick("B", 7, T0 + 6000, 50.0))
    q.processAllAvailable()
    q.stop()

    val alerts = spark.table("adaptive_alerts_test").collect()
    assert(alerts.length === 1, s"exactly the outlier alerts: ${alerts.toSeq}")
    val a = alerts.head
    assert(a.getAs[String]("token") === "A")
    assert(a.getAs[Double]("price") === 111.0)
    assert(a.getAs[Double]("ret") === 10.0)
    // offline Welford replay of the 5 warm-up returns gives the exact z
    val rets = pricesA.zip(pricesA.tail).map { case (x, y) => y - x }
    var (n, mean, m2) = (0L, 0.0, 0.0)
    rets.foreach { r =>
      n += 1; val d = r - mean; mean += d / n; m2 += d * (r - mean)
    }
    val z = math.rint((10.0 - mean) / math.sqrt(m2 / n) * 1e4) / 1e4
    assert(a.getAs[Double]("z") === z)
  }
}
