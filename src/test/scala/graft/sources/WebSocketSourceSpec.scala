package graft.sources

import graft.SparkSpec
import graft.core.Codec
import graft.core.Schemas.TickFrame
import org.apache.spark.sql.streaming.Trigger

/** Live WebSocket FrameSource (SURVEY §2.1 S1 live path): JDK
  * java.net.http.WebSocket client against an in-process RFC 6455 server
  * playing the broker (/root/reference/ws/client.go:34-112). */
class WebSocketSourceSpec extends SparkSpec {

  private def frame(token: String, seq: Long): Array[Byte] =
    Codec.encode(TickFrame(1, 1, token, seq, 1704447000000L + seq * 1000, 100L * seq,
      None, None, None, None, None, None, None, None, None))

  /** Poll until `cond` holds (bench box can stall threads; be generous). */
  private def awaitTrue(timeoutMs: Long = 30000)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(25); ok = cond }
    ok
  }

  test("backoff policy matches the reference: 1s->30s, x2.0, jitter, cap") {
    val b = WsBackoff() // defaults = /root/reference/utils/backoff.go:9-17
    val noJitter = new java.util.Random() {
      override def nextDouble(): Double = 0.5 // jitter factor -> exactly 1.0
    }
    val delays = (0 to 6).map(b.delayMillis(_, noJitter))
    assert(delays === Seq(1000L, 2000L, 4000L, 8000L, 16000L, 30000L, 30000L),
      "exponential x2 from 1s, capped at 30s")
    // randomization 0.1 keeps every draw within +-10% of the base
    val rng = new java.util.Random(42)
    val jittered = (1 to 200).map(_ => b.delayMillis(3, rng))
    assert(jittered.forall(d => d >= 7200L && d <= 8800L),
      s"jitter must stay within 10% of 8000ms, saw ${jittered.min}..${jittered.max}")
  }

  test("client delivers server frames into the feed; subscribe + auth headers sent") {
    val server = new TestWsServer().start()
    val channel = "ws-spec-deliver"
    LiveFrameFeed.clear(channel)
    val auth = BrokerAuthConfig("https://broker.example", "C123", "pw", "key-1", "totp")
    val client = new WebSocketFrameClient(
      server.url, channel,
      headers = auth.wsHeaders(authToken = "AT", feedToken = "FT"),
      subscribeMessage = Some("""{"action":1,"mode":2}"""),
      backoff = WsBackoff(50, 200, 2.0, 0.0)).start()
    try {
      (1L to 5L).foreach(s => server.send(frame("WS", s)))
      assert(awaitTrue()(LiveFrameFeed.size(channel) == 5L),
        "all five binary frames must land in the feed")
      val seqs = LiveFrameFeed.slice(channel, 0, 5)
        .map(Codec.decode(_).toOption.get.sequenceNumber).sorted
      assert(seqs === (1L to 5L).toArray)
      assert(awaitTrue()(server.receivedTexts.contains("""{"action":1,"mode":2}""")),
        "subscribe payload must be sent on connect")
      val headers = server.receivedHeaders.toArray.map(_.toString.toLowerCase)
      assert(headers.exists(_.startsWith("authorization: bearer at")),
        s"Authorization header must reach the server (saw ${headers.mkString("; ")})")
      assert(headers.exists(h => h.startsWith("x-feed-token: ft")))
    } finally { client.stop(); server.stop() }
  }

  test("heartbeat: a 'ping' text arrives within the interval") {
    val server = new TestWsServer().start()
    val channel = "ws-spec-hb"
    LiveFrameFeed.clear(channel)
    val client = new WebSocketFrameClient(
      server.url, channel, heartbeatMillis = 100,
      backoff = WsBackoff(50, 200, 2.0, 0.0)).start()
    try
      assert(awaitTrue()(server.receivedTexts.contains("ping")),
        "client must send the reference's text heartbeat (ws/client.go:68)")
    finally { client.stop(); server.stop() }
  }

  test("reconnects after an abrupt drop and resumes delivery (re-subscribing)") {
    val server = new TestWsServer().start()
    val channel = "ws-spec-reconnect"
    LiveFrameFeed.clear(channel)
    val client = new WebSocketFrameClient(
      server.url, channel, subscribeMessage = Some("SUB"),
      backoff = WsBackoff(50, 200, 2.0, 0.0)).start()
    try {
      (1L to 3L).foreach(s => server.send(frame("RC", s)))
      assert(awaitTrue()(LiveFrameFeed.size(channel) == 3L))
      server.drop() // no close frame — client must detect and re-dial
      (4L to 6L).foreach(s => server.send(frame("RC", s)))
      assert(awaitTrue()(LiveFrameFeed.size(channel) == 6L),
        "frames queued across the drop must arrive after reconnect")
      assert(client.connectCount >= 2, "a second connect must have happened")
      assert(server.receivedTexts.toArray.count(_ == "SUB") >= 2,
        "subscribe must be re-sent on every (re)connect, like the reference's Connect path")
      val seqs = LiveFrameFeed.slice(channel, 0, 6)
        .map(Codec.decode(_).toOption.get.sequenceNumber).sorted
      assert(seqs === (1L to 6L).toArray, "no frame lost or duplicated across reconnect")
    } finally { client.stop(); server.stop() }
  }

  test("end-to-end: WS server -> websocket source -> decode -> rows; commit trims the feed") {
    val server = new TestWsServer().start()
    val channel = "ws-spec-e2e"
    LiveFrameFeed.clear(channel)
    (1L to 5L).foreach(s => server.send(frame("E2E", s))) // queued pre-connect
    val q = spark.readStream
      .format("graft.sources.FrameReplayProvider")
      .option("source", "websocket")
      .option("url", server.url)
      .option("channel", channel)
      .option("backoffInitialMillis", "50")
      .option("maxFramesPerBatch", "4")
      .load()
      .writeStream.format("memory").queryName("ws_e2e_out")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    try {
      def seen(): Long = spark.table("ws_e2e_out").count()
      assert(awaitTrue()(seen() == 5L), "pre-queued frames must flow through the query")
      (6L to 8L).foreach(s => server.send(frame("E2E", s)))
      assert(awaitTrue()(seen() == 8L), "frames pushed mid-run must arrive")
      val seqs = spark.table("ws_e2e_out").collect()
        .map(r => Codec.decode(r.getAs[Array[Byte]]("payload")).toOption.get.sequenceNumber)
        .sorted
      assert(seqs === (1L to 8L).toArray)
      // trim-on-commit: Spark commits batch N when batch N+1 runs, so the
      // buffer retains AT MOST the final un-committed batch — bounded
      // memory for a long-running feed (absolute offsets stay valid via
      // the trim base). Everything before the last 3-frame batch is gone.
      assert(awaitTrue()(LiveFrameFeed.slice(channel, 0, 5).isEmpty),
        "frames of committed batches must be trimmed from the live buffer")
      assert(LiveFrameFeed.size(channel) == 8L,
        "trim must preserve the absolute offset (size = trim base + retained)")
    } finally {
      q.stop()
      WebSocketFrameClient.stop(channel)
      server.stop()
    }
  }

  test("a client that exhausted its backoff budget is replaced on next ensure, not pinned") {
    val channel = "ws-spec-replace"
    LiveFrameFeed.clear(channel)
    // a port with nothing listening: every dial fails fast
    val deadPort = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val c1 = WebSocketFrameClient.ensure(channel, () => new WebSocketFrameClient(
      s"ws://127.0.0.1:$deadPort/", channel,
      backoff = WsBackoff(10, 20, 2.0, 0.0, maxElapsedMillis = 50)))
    assert(awaitTrue()(c1.isStopped),
      "client must give up after maxElapsed of consecutive failures")
    // the broker "recovers": the next planning cycle's ensure must
    // re-dial with a fresh client instead of returning the dead one
    val server = new TestWsServer().start()
    try {
      val c2 = WebSocketFrameClient.ensure(channel, () => new WebSocketFrameClient(
        server.url, channel, backoff = WsBackoff(50, 200, 2.0, 0.0)))
      assert(!(c2 eq c1), "a stopped client must be replaced, not returned")
      server.send(frame("RPL", 1L))
      assert(awaitTrue()(LiveFrameFeed.size(channel) == 1L),
        "the replacement client must deliver")
    } finally { WebSocketFrameClient.stop(channel); server.stop() }
  }

  test("spool-backed websocket source: durable capture, restart resumes from checkpoint") {
    import java.nio.file.Files
    val server = new TestWsServer().start()
    val channel = "ws-spec-spool"
    LiveFrameFeed.clear(channel)
    val spool = Files.createTempDirectory("wsspool").toString
    val ckpt = Files.createTempDirectory("wsspoolck").toString
    val sink = Files.createTempDirectory("wsspoolsink").toString
    def run(expect: Long): Unit = {
      val q = spark.readStream
        .format("graft.sources.FrameReplayProvider")
        .option("source", "websocket")
        .option("url", server.url)
        .option("channel", channel)
        .option("spoolDir", spool)
        .option("backoffInitialMillis", "50")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .start()
      def rows(): Long = // sink dir is empty until the first batch lands
        try spark.read.parquet(sink).count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      try assert(awaitTrue()(rows() == expect), s"expected $expect rows in the sink")
      finally q.stop()
    }
    try {
      (1L to 4L).foreach(s => server.send(frame("SPOOL", s)))
      run(4L)
      // frames are ON DISK, not in a JVM buffer: the capture survives
      assert(FrameSpool.listFiles(spool).map(_._2).sum === 4L)
      // stop everything, push more while no query runs, restart: the
      // spool + checkpoint resume without loss or re-read
      (5L to 7L).foreach(s => server.send(frame("SPOOL", s)))
      assert(awaitTrue()(FrameSpool.listFiles(spool).map(_._2).sum == 7L),
        "client keeps spooling between query runs")
      run(7L)
      val seqs = spark.read.parquet(sink).collect()
        .map(r => Codec.decode(r.getAs[Array[Byte]]("payload")).toOption.get.sequenceNumber)
        .sorted
      assert(seqs === (1L to 7L).toArray, "restart must not duplicate or lose frames")
    } finally {
      WebSocketFrameClient.stop(channel)
      server.stop()
    }
  }

  test("heartbeat is precise: a slow-draining peer skips ticks, only a FAILED send is death") {
    // drive the tick directly with a never-completing send future — the
    // deterministic stand-in for a peer that hasn't drained the prior
    // ping (stalling a real JDK socket send is timing-dependent)
    val pending = new java.util.concurrent.CompletableFuture[AnyRef]()
    var sends = 0
    var dead = 0
    val tick = new HeartbeatTick({ () => sends += 1; pending }, () => dead += 1)
    (1 to 5).foreach(_ => tick.run())
    assert(sends === 1, "while the first ping is in flight, later ticks must not send")
    assert(tick.skipped === 4, "the in-flight ticks are skipped, not escalated")
    assert(dead === 0, "a slow peer must NOT be declared dead (no reconnect storm)")
    pending.complete(null)
    tick.run()
    assert(sends === 2, "once the ping drains, the next tick sends again")
    assert(dead === 0)
    // death is declared exactly where the JDK reports I/O failure: the
    // send future completing exceptionally
    val failing = new java.util.concurrent.CompletableFuture[AnyRef]()
    failing.completeExceptionally(new java.io.IOException("broken pipe"))
    val tick2 = new HeartbeatTick(() => failing, () => dead += 1)
    tick2.run()
    assert(dead === 1, "a failed ping send must trigger the reconnect path")
    // ...and at the wedged-peer bound: a ping pending for
    // maxConsecutiveSkips straight intervals (TCP zero-window, no error,
    // no FIN) must ALSO declare death — exactly once — instead of
    // skipping forever while the source delivers nothing
    val wedged = new java.util.concurrent.CompletableFuture[AnyRef]()
    var dead3 = 0
    val tick3 = new HeartbeatTick(() => wedged, () => dead3 += 1, maxConsecutiveSkips = 3)
    tick3.run()                       // sends; future never completes
    (1 to 2).foreach(_ => tick3.run()) // 2 skips: still tolerated
    assert(dead3 === 0, "below the bound a pending ping is just a slow peer")
    tick3.run()                        // 3rd consecutive skip = the bound
    assert(dead3 === 1, "a wedged peer must be declared dead at the bound")
    tick3.run()
    assert(dead3 === 1, "death fires once; the owner tears the connection down")
  }

  test("client releases its delivery resource on stop AND on self-retirement") {
    // stop(): the hook must run exactly once even with loop-exit racing it
    val server = new TestWsServer().start()
    val closed1 = new java.util.concurrent.atomic.AtomicInteger(0)
    val c1 = new WebSocketFrameClient(
      server.url, "ws-spec-hook-stop", backoff = WsBackoff(50, 200, 2.0, 0.0),
      deliver = Some(_ => ()), onStop = Some(() => closed1.incrementAndGet())).start()
    try {
      assert(awaitTrue()(c1.connectCount >= 1))
      c1.stop()
      assert(awaitTrue()(closed1.get() == 1), "stop() must close the delivery resource")
      Thread.sleep(100) // give the loop thread's finally a chance to double-fire
      assert(closed1.get() === 1, "cleanup must be idempotent")
    } finally server.stop()
    // self-retirement (exhausted backoff budget): nobody calls stop() on a
    // gave-up client — its own loop exit must release the resource (the
    // spool appender fd leak from the round-5 advice)
    val deadPort = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val closed2 = new java.util.concurrent.atomic.AtomicInteger(0)
    val c2 = new WebSocketFrameClient(
      s"ws://127.0.0.1:$deadPort/", "ws-spec-hook-retire",
      backoff = WsBackoff(10, 20, 2.0, 0.0, maxElapsedMillis = 50),
      deliver = Some(_ => ()), onStop = Some(() => closed2.incrementAndGet())).start()
    assert(awaitTrue()(c2.isStopped))
    assert(awaitTrue()(closed2.get() == 1),
      "a client that gave up must close its resource without a stop() call")
  }

  test("BrokerAuthConfig never prints credentials") {
    val cfg = BrokerAuthConfig("https://api.example", "C42", "s3cret-pw", "k3y", "TOTPSECRET")
    val s = cfg.toString
    assert(!s.contains("s3cret-pw") && !s.contains("k3y") && !s.contains("TOTPSECRET"),
      s"toString must redact credentials, saw: $s")
    assert(s.contains("https://api.example") && s.contains("C42"),
      "non-secret routing fields stay visible for debugging")
  }

  test("live memory source also trims on commit (bounded buffer across batches)") {
    val channel = "ws-spec-trim-mem"
    LiveFrameFeed.clear(channel)
    (1L to 6L).foreach(s => LiveFrameFeed.append(channel, frame("TRIM", s)))
    val q = spark.readStream
      .format("graft.sources.FrameReplayProvider")
      .option("source", "memory")
      .option("channel", channel)
      .option("maxFramesPerBatch", "2")
      .load()
      .writeStream.format("memory").queryName("trim_mem_out")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      assert(awaitTrue()(spark.table("trim_mem_out").count() == 6L))
      // batches of 2: the first two batches commit (as successors run)
      // and their frames are trimmed; only the final un-committed batch
      // may remain buffered
      assert(awaitTrue()(LiveFrameFeed.slice(channel, 0, 4).isEmpty),
        "committed batches' frames must be dropped from the buffer")
      assert(LiveFrameFeed.size(channel) == 6L, "absolute offsets survive trimming")
    } finally { q.stop(); LiveFrameFeed.clear(channel) }
  }
}
