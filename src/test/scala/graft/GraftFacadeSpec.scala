package graft

import graft.core.{Codec, Schemas}
import graft.sources.{FrameSpool, LiveFrameFeed}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The facade end-to-end: session -> live ingest -> queries -> metrics —
  * the reference user's whole workflow through one object. */
class GraftFacadeSpec extends AnyFunSuite {

  private def frame(token: String, seq: Long, tsMs: Long, ltp: Long): Array[Byte] =
    Codec.encode(Schemas.TickFrame(2, 1, token, seq, tsMs, ltp,
      Some(5L), Some(ltp), Some(10L), Some(1.0), Some(2.0),
      Some(ltp - 50), Some(ltp + 100), Some(ltp - 100), Some(ltp)))

  private def tokensJson(): String = {
    val f = new java.io.File(Files.createTempDirectory("gtok").toFile, "tokens.json")
    Files.writeString(f.toPath,
      """{"symbol": "RELIANCE", "token": "2885", "exchange": "NSE_CM"}""")
    f.getAbsolutePath
  }

  test("session -> live feed -> ingest -> query -> metrics, end to end") {
    val spark = Graft.session(cores = 4)
    try {
      val t0 = 1704447000000L
      val channel = "facade-live"
      LiveFrameFeed.clear(channel)
      (1L to 5L).foreach(s => LiveFrameFeed.append(channel, frame("2885", s, t0 + s * 1000, 286500L + s)))

      val sink = Files.createTempDirectory("gsink").toString
      val ckpt = Files.createTempDirectory("gckpt").toString
      val (listener, server) = Graft.serveMetrics(spark)
      try {
        val q = Graft.ingestLive(spark, channel, tokensJson(), sink, ckpt,
          Trigger.ProcessingTime("1 second"))
        q.processAllAvailable()
        q.stop()

        val latest = queries.TickQueries.latestTick(Graft.ticks(spark, sink), "2885").collect()
        assert(latest.length === 1)
        assert(latest(0).getAs[Long]("sequence_number") === 5L)
        assert(latest(0).getAs[String]("symbol") === "RELIANCE")

        val deadline = System.currentTimeMillis() + 10000
        while (listener.rowsProcessed.get < 5 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        val metrics = scala.io.Source.fromURL(
          s"http://127.0.0.1:${server.boundPort}/metrics").mkString
        assert(metrics.contains("graft_ticks_processed_total 5"))
      } finally {
        server.stop()
        spark.streams.removeListener(listener)
        LiveFrameFeed.clear(channel)
      }
    } finally () // shared-session harness: do not stop the JVM-wide session
  }

  test("websocket ingest: stub broker -> WS source -> decode -> tick table") {
    val spark = Graft.session(cores = 4)
    val server = new graft.sources.TestWsServer().start()
    val channel = "facade-ws"
    graft.sources.LiveFrameFeed.clear(channel)
    val t0 = 1704447000000L
    (1L to 4L).foreach(s => server.send(frame("2885", s, t0 + s * 1000, 286500L + s)))
    val sink = Files.createTempDirectory("gwssink").toString
    val ckpt = Files.createTempDirectory("gwsckpt").toString
    try {
      val q = Graft.ingestWebSocket(spark, server.url,
        headers = Map("Authorization" -> "Bearer test-jwt"),
        tokensJson(), sink, ckpt,
        subscribeJson = Some("""{"action":1}"""),
        channel = Some(channel),
        trigger = Trigger.ProcessingTime("500 milliseconds"))
      try {
        val deadline = System.currentTimeMillis() + 60000
        // the table doesn't exist until the first micro-batch commits
        def rows() =
          try Graft.ticks(spark, sink).count()
          catch { case _: org.apache.spark.sql.AnalysisException => 0L }
        while (rows() < 4 && System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(rows() === 4, "all broker frames must land in the tick table")
        val latest = queries.TickQueries.latestTick(Graft.ticks(spark, sink), "2885").collect()
        assert(latest(0).getAs[Long]("sequence_number") === 4L)
        assert(server.receivedTexts.contains("""{"action":1}"""), "subscribe sent")
        assert(server.receivedHeaders.toArray.map(_.toString.toLowerCase)
          .exists(_.startsWith("authorization: bearer test-jwt")))
      } finally q.stop()
    } finally {
      graft.sources.WebSocketFrameClient.stop(channel)
      server.stop()
      graft.sources.LiveFrameFeed.clear(channel)
    }
  }

  /** In-process stub broker speaking the reference's login shape. */
  private def stubBroker(decline: => Boolean): com.sun.net.httpserver.HttpServer = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/rest/auth/angelbroking/user/v1/loginByPassword",
      (ex: HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        val resp =
          if (decline) """{"status":false,"message":"Invalid totp","data":{}}"""
          else """{"status":true,"message":"SUCCESS",""" +
            """"data":{"jwtToken":"jwt-live","feedToken":"feed-live"}}"""
        val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    server.start()
    server
  }

  test("liveIngest: auth handshake -> websocket -> decode -> tick table, one call") {
    val spark = Graft.session(cores = 4)
    val broker = stubBroker(decline = false)
    val ws = new graft.sources.TestWsServer().start()
    val channel = "facade-liveingest"
    graft.sources.LiveFrameFeed.clear(channel)
    val t0 = 1704447000000L
    (1L to 3L).foreach(s => ws.send(frame("2885", s, t0 + s * 1000, 286500L + s)))
    val sink = Files.createTempDirectory("glisink").toString
    val ckpt = Files.createTempDirectory("glickpt").toString
    try {
      val cfg = graft.sources.BrokerAuthConfig(
        s"http://127.0.0.1:${broker.getAddress.getPort}",
        "C9", "pin", "key-abc", "GEZDGNBVGY3TQOJQGEZDGNBVGY3TQOJQ")
      val started = Graft.liveIngest(spark, cfg, ws.url, tokensJson(), sink, ckpt,
        subscribeJson = Some("""{"action":1}"""), channel = Some(channel),
        trigger = Trigger.ProcessingTime("500 milliseconds"))
      assert(started.isRight, s"auth must succeed: $started")
      val q = started.toOption.get
      try {
        val deadline = System.currentTimeMillis() + 60000
        def rows() =
          try Graft.ticks(spark, sink).count()
          catch { case _: org.apache.spark.sql.AnalysisException => 0L }
        while (rows() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(rows() === 3, "broker frames must land in the tick table via one call")
        // the login's tokens travelled to the socket as the reference's headers
        val headers = ws.receivedHeaders.toArray.map(_.toString.toLowerCase)
        assert(headers.exists(_.startsWith("authorization: bearer jwt-live")),
          s"jwtToken from the handshake must reach the WS connect (saw ${headers.mkString("; ")})")
        assert(headers.exists(_.startsWith("x-feed-token: feed-live")))
        assert(ws.receivedTexts.contains("""{"action":1}"""), "subscribe sent on connect")
      } finally q.stop()
    } finally {
      graft.sources.WebSocketFrameClient.stop(channel)
      ws.stop()
      broker.stop(0)
      graft.sources.LiveFrameFeed.clear(channel)
    }
  }

  test("liveIngest: a declined login is a clear Left, no query started") {
    val spark = Graft.session(cores = 4)
    val broker = stubBroker(decline = true)
    try {
      val before = spark.streams.active.length
      val cfg = graft.sources.BrokerAuthConfig(
        s"http://127.0.0.1:${broker.getAddress.getPort}",
        "C9", "bad-pin", "key-abc", "GEZDGNBVGY3TQOJQGEZDGNBVGY3TQOJQ")
      val res = Graft.liveIngest(spark, cfg, "ws://127.0.0.1:1/never", tokensJson(),
        Files.createTempDirectory("glxsink").toString,
        Files.createTempDirectory("glxckpt").toString)
      assert(res === Left("authentication failed: Invalid totp"))
      assert(spark.streams.active.length === before,
        "no streaming query may start on declined auth")
    } finally broker.stop(0)
  }

  private def writeJsonlGz(dir: String, name: String, lines: Seq[String]): Unit = {
    val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
      new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(new java.io.File(dir, name))), "UTF-8"))
    try lines.foreach(out.println) finally out.close()
  }

  private def doc(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "en"}"""

  // 25 lowercase words, no punctuation: n_words=25 >= MinWords(20),
  // quality = min(1, 25/50) * 1.0 = 0.5 >= MinQuality(0.3)
  private def goodText(tag: String): String =
    (1 to 25).map(i => s"${tag}x$i").mkString(" ")

  test("hybridSearch targetRecall routes the vector leg through the measured ladder") {
    val spark = Graft.session(cores = 4)
    val dir = "/root/testdata/sf0.001"
    val qids = Seq(0L, 1L, 2L)
    // target 1.0: only an exact-recall rung (or the brute fallback)
    // clears it, so the fusion must equal the explicit brute-leg run
    val exact = Graft.hybridSearch(spark, dir, qids, k = 5,
      targetRecall = Some(1.0)).collect().toSeq
    val brute = Graft.hybridSearch(spark, dir, qids, k = 5,
      method = "brute").collect().toSeq
    assert(exact === brute,
      "a 1.0 recall contract must fuse an exact-recall vector leg")
    // target satisfaction: the memoized plan the call used measured at
    // or above the contract
    val plan = ops.Similarity.planAnnCached(spark, dir, 0.9, k = 20)
    val got = Graft.hybridSearch(spark, dir, qids, k = 5, targetRecall = Some(0.9))
    assert(plan.calibratedRecall >= 0.9,
      s"plan ${plan.method} calibrated ${plan.calibratedRecall} below target")
    assert(got.columns.toSeq === Seq("qid", "doc_id", "rrf_score"))
    assert(got.count() > 0)
  }

  test("annSearch routes every ANN method; buildVectorIndex routes every layout") {
    val spark = Graft.session(cores = 4)
    val dir = "/root/testdata/sf0.001"
    val qids = Seq(0L, 1L, 2L)
    // every exact-similarity method returns the (qid, vec_id, cos_sim)
    // contract and finds neighbors on the real corpus
    for (m <- Seq("brute", "lsh", "lsh_multiprobe", "lsh_multitable",
                  "ivf", "pq_rerank", "ivfpq", "ivfpq_residual", "sq_rerank")) {
      val rows = Graft.annSearch(spark, dir, qids, k = 3, nprobe = 2, method = m)
      assert(rows.columns.toSeq === Seq("qid", "vec_id", "cos_sim"), s"method $m")
      assert(rows.count() > 0, s"method $m returned nothing")
    }
    // the ADC-only methods are the paths whose similarities are
    // approximate, and their column name says so
    for (m <- Seq("pq", "sq")) {
      val adc = Graft.annSearch(spark, dir, qids, k = 3, method = m)
      assert(adc.columns.toSeq === Seq("qid", "vec_id", "approx_sim"), s"method $m")
      assert(adc.count() > 0, s"method $m returned nothing")
    }
    intercept[IllegalArgumentException] {
      Graft.annSearch(spark, dir, qids, method = "annoy")
    }
    // index builds: each layout writes its files (into a copied dir —
    // the shared testdata stays read-only)
    val tmp = Files.createTempDirectory("gidx").toString
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    Graft.buildVectorIndex(spark, tmp, method = "ivf")
    assert(new java.io.File(ops.Similarity.ivfPostingsPath(tmp)).exists())
    Graft.buildVectorIndex(spark, tmp, method = "pq")
    assert(new java.io.File(ops.Similarity.pqCodesPath(tmp)).exists())
    Graft.buildVectorIndex(spark, tmp, method = "ivfpq")
    assert(new java.io.File(ops.Similarity.ivfPqPostingsPath(tmp)).exists())
    Graft.buildVectorIndex(spark, tmp, method = "sq")
    assert(new java.io.File(ops.ScalarQuant.sqCodesPath(tmp)).exists())
    // the composed index now serves annSearch(method = "ivfpq") from files
    val served = Graft.annSearch(spark, tmp, qids, k = 3, nprobe = 2, method = "ivfpq")
    assert(served.count() > 0)
    intercept[IllegalArgumentException] {
      Graft.buildVectorIndex(spark, tmp, method = "hnsw")
    }
    // the recall-contract entry point: calibrates on the corpus (or a
    // sampled calibDir at scale) and serves the chosen plan
    val tuned = Graft.annSearchTuned(spark, dir, qids, targetRecall = 0.3, k = 3)
    assert(tuned.columns.toSeq === Seq("qid", "vec_id", "cos_sim"))
    assert(tuned.count() > 0, "tuned search must serve the chosen plan")
  }

  test("text retrieval facade: keyword search, more-like-this, hybrid fusion") {
    val spark = Graft.session(cores = 4)
    val dir = "/root/testdata/sf0.001"
    val kw = Graft.keywordSearch(spark, dir, Seq("spark", "window"), k = 5).collect()
    assert(kw.nonEmpty && kw.forall(_.getAs[Double]("score") > 0.0))
    val mlt = Graft.moreLikeThis(spark, dir, Seq(0L), k = 5).collect()
    assert(mlt.nonEmpty && mlt.forall(_.getAs[Long]("doc_id") !== 0L))
    val hyb = Graft.hybridSearch(spark, dir, Seq(0L), k = 5).collect()
    assert(hyb.nonEmpty && hyb.forall(_.getAs[Double]("rrf_score") > 0.0))
    // building the index into a copied dir leaves scores identical
    val tmp = Files.createTempDirectory("gtext").toString
    for (t <- Seq("documents", "embeddings"))
      spark.read.parquet(s"$dir/$t.parquet")
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    val before = Graft.keywordSearch(spark, tmp, Seq("spark", "window"), k = 5).collect().toSeq
    Graft.buildTextIndex(spark, tmp)
    assert(new java.io.File(ops.TextRanking.textPostingsPath(tmp)).exists())
    assert(Graft.keywordSearch(spark, tmp, Seq("spark", "window"), k = 5).collect().toSeq === before)
  }

  test("dataset mixing facade: temperature mix, quota, weighted sample, shard packing") {
    val spark = Graft.session(cores = 4)
    val dir = "/root/testdata/sf0.001"
    assert(Graft.temperatureMix(spark, dir).count() > 0)
    assert(Graft.quotaSample(spark, dir, "lang", 10)
      .groupBy("lang").count().collect().forall(_.getLong(1) <= 10))
    assert(Graft.weightedSample(spark, dir, "n_chars", 5).count() === 5)
    val tok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("long").as("t"))
    val sh = Graft.packShards(tok, "doc_id", "t", 500L)
    assert(sh.count() === tok.count())
    assert(sh.select("shard").distinct().count() > 1)
    // incremental text-index maintenance rides the facade too
    val tmp = java.nio.file.Files.createTempDirectory("gtextinc").toString
    spark.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") < 40)
      .write.parquet(s"$tmp/documents.parquet")
    Graft.buildTextIndex(spark, tmp)
    Graft.appendToTextIndex(spark, tmp,
      spark.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") >= 40), 1L)
    Graft.compactTextIndex(spark, tmp)
    assert(Graft.keywordSearch(spark, tmp, Seq("spark", "window"), k = 5).count() > 0)
  }

  test("nearDupClusters: the default dedup face is the LINEAR cluster contract") {
    val spark = Graft.session(cores = 4)
    val dir = "/root/testdata/sf0.001"
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    for (m <- Seq("minhash", "simhash", "ngram")) {
      val c = Graft.nearDupClusters(spark, dir, m)
      // dup-structure-sized output: exactly ONE row per document — the
      // all-pairs contract (quadratic in family size) is never
      // materialized on the facade's default path
      assert(c.count() === nDocs, s"$m: one row per doc")
      assert(c.columns.toSeq === Seq("doc_id", "cluster_rep", "cluster_size"),
        s"$m: cluster contract columns")
      assert(!c.columns.contains("doc_a"), s"$m must not be pair-shaped")
      // rep is a member id and sizes are consistent
      val bySize = c.groupBy("cluster_rep").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      c.collect().foreach { r =>
        assert(bySize(r.getLong(1)) === r.getLong(2), "cluster_size consistent")
      }
    }
    // semantic face has its own threshold domain but the same contract
    val sem = Graft.nearDupClusters(spark, dir, "semantic")
    assert(sem.columns.toSeq === Seq("doc_id", "cluster_rep", "cluster_size"))
    intercept[IllegalArgumentException] {
      Graft.nearDupClusters(spark, dir, "allpairs")
    }
  }

  test("curation keeps the text index: searchable survivors, append == rebuild, replay-clean") {
    val spark = Graft.session(cores = 4)
    val docsDir = Files.createTempDirectory("gtidx_in").toString
    val corpusDir = Files.createTempDirectory("gtidx_corpus").toString + "/c"
    val indexDir = Files.createTempDirectory("gtidx_fp").toString + "/i"
    val textDir = Files.createTempDirectory("gtidx_text").toString
    val ckpt = Files.createTempDirectory("gtidx_ck").toString
    val a = goodText("alpha")
    val b = goodText("beta")
    def run(): Unit = {
      val q = Graft.curateCorpus(spark, docsDir, corpusDir, indexDir, ckpt,
        maxFilesPerTrigger = 1, compactEvery = 0, textIndexDir = Some(textDir))
      assert(q.awaitTermination(120000), "AvailableNow curation must drain and stop")
    }
    writeJsonlGz(docsDir, "r1.jsonl.gz", Seq(doc(1, a)))
    run()
    // run 2: a cross-run exact duplicate (must NOT reach the text index)
    // plus a genuinely new doc
    writeJsonlGz(docsDir, "r2.jsonl.gz", Seq(doc(2, a), doc(3, b)))
    run()
    val hits = Graft.keywordSearch(spark, textDir, Seq("alphax1"), k = 10).collect()
    assert(hits.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L),
      "the duplicate doc 2 must not be searchable")
    assert(Graft.keywordSearch(spark, textDir, Seq("betax3"), k = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSeq === Seq(3L))
    // append-exactness against an independent rebuild over the curated corpus
    val rebuilt = Files.createTempDirectory("gtidx_rebuild").toString
    spark.read.parquet(corpusDir).select("doc_id", "text")
      .write.parquet(s"$rebuilt/documents.parquet")
    Graft.buildTextIndex(spark, rebuilt)
    val q2 = Seq("alphax1", "betax3", "alphax7")
    assert(Graft.keywordSearch(spark, textDir, q2, k = 10).collect().toSeq
      === Graft.keywordSearch(spark, rebuilt, q2, k = 10).collect().toSeq,
      "incrementally-maintained index must score exactly like a rebuild")
    // compaction after the stream stops preserves scores
    Graft.compactTextIndex(spark, textDir)
    assert(Graft.keywordSearch(spark, textDir, q2, k = 10).collect().toSeq
      === Graft.keywordSearch(spark, rebuilt, q2, k = 10).collect().toSeq)
  }

  test("curation chunk sink: survivors chunk per batch, dropped docs never chunk, replay-clean") {
    val spark = Graft.session(cores = 4)
    val docsDir = Files.createTempDirectory("gchunk_in").toString
    val corpusDir = Files.createTempDirectory("gchunk_corpus").toString + "/c"
    val indexDir = Files.createTempDirectory("gchunk_fp").toString + "/i"
    val chunksDir = Files.createTempDirectory("gchunk_chunks").toString + "/ch"
    val ckpt = Files.createTempDirectory("gchunk_ck").toString
    val a = goodText("alpha")
    val b = goodText("beta")
    def run(): Unit = {
      val q = Graft.curateCorpus(spark, docsDir, corpusDir, indexDir, ckpt,
        maxFilesPerTrigger = 1, compactEvery = 0, chunksDir = Some(chunksDir))
      assert(q.awaitTermination(120000), "AvailableNow curation must drain and stop")
    }
    writeJsonlGz(docsDir, "r1.jsonl.gz", Seq(doc(1, a)))
    run()
    // run 2: a cross-run exact dup (must not chunk) + a new doc
    writeJsonlGz(docsDir, "r2.jsonl.gz", Seq(doc(2, a), doc(3, b)))
    run()
    val chunks = spark.read.parquet(chunksDir)
    val ids = chunks.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L), s"only survivors chunk: $ids")
    // the streamed chunks equal the batch operator over the curated corpus
    import org.apache.spark.sql.functions.col
    val expected = graft.ops.TextAnalysis.chunkDocumentsDf(
        spark.read.parquet(corpusDir).select("doc_id", "text"),
        graft.ops.CurationPipeline.ChunkMaxTokens,
        graft.ops.CurationPipeline.ChunkOverlap)
      .orderBy("doc_id", "chunk_idx").collect().map(_.toString).toSeq
    val got = chunks.select("doc_id", "chunk_idx", "chunk_text", "n_tokens")
      .orderBy("doc_id", "chunk_idx").collect().map(_.toString).toSeq
    assert(got === expected, "streamed chunks must equal the batch chunking of the corpus")
  }

  test("curation media gate: a re-encoded copy of a prior run's image is dropped") {
    val spark = Graft.session(cores = 4)
    val docsDir = Files.createTempDirectory("gph_in").toString
    val corpusDir = Files.createTempDirectory("gph_corpus").toString + "/c"
    val indexDir = Files.createTempDirectory("gph_fp").toString + "/i"
    val phashDir = Files.createTempDirectory("gph_ph").toString + "/p"
    val ckpt = Files.createTempDirectory("gph_ck").toString
    def png(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (cell <- 0 until 64) {
        val v = (seed * 37 + cell * 11) % 256
        img.setRGB(cell % 8, cell / 8, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    def mdoc(id: Long, text: String, media: Array[Byte]): String = {
      val b64 = java.util.Base64.getEncoder.encodeToString(media)
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "media_b64": "$b64"}"""
    }
    def run(): Unit = {
      val q = Graft.curateCorpus(spark, docsDir, corpusDir, indexDir, ckpt,
        maxFilesPerTrigger = 1, compactEvery = 0, phashDir = Some(phashDir))
      assert(q.awaitTermination(120000), "AvailableNow curation must drain and stop")
    }
    // run 1: one image doc
    writeJsonlGz(docsDir, "r1.jsonl.gz", Seq(mdoc(1, goodText("alpha"), png(5))))
    run()
    // run 2: a RE-ENCODED copy of run 1's image (identical pixels, one
    // byte appended after IEND — different payload md5 AND different
    // text, so every text gate passes it), a genuinely new image, and a
    // text-only doc (no media field)
    writeJsonlGz(docsDir, "r2.jsonl.gz", Seq(
      mdoc(2, goodText("beta"), png(5) :+ 0x00.toByte),
      mdoc(3, goodText("gamma"), png(91)),
      doc(4, goodText("delta"))))
    run()
    val ids = spark.read.parquet(corpusDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L, 4L),
      s"the re-encoded duplicate image (doc 2) must be dropped by the phash gate: $ids")
  }

  test("streaming decontamination gate: contaminated docs are curated yet never chunk") {
    val spark = Graft.session(cores = 4)
    val docsDir = Files.createTempDirectory("gdc_in").toString
    val corpusDir = Files.createTempDirectory("gdc_corpus").toString + "/c"
    val indexDir = Files.createTempDirectory("gdc_fp").toString + "/i"
    val chunksDir = Files.createTempDirectory("gdc_chunks").toString + "/ch"
    val benchDir = Files.createTempDirectory("gdc_bench").toString + "/b"
    val ckpt = Files.createTempDirectory("gdc_ck").toString
    // a benchmark doc, and a "paraphrase" training doc that copies a
    // verbatim 13-word run from it inside otherwise-fresh text (passes
    // the exact AND near-dup gates: most of its words are new)
    val benchText = (1 to 25).map(i => s"benchx$i").mkString(" ")
    val leak13 = (5 to 17).map(i => s"benchx$i").mkString(" ")
    val paraphrase = (1 to 6).map(i => s"freshx$i").mkString(" ") +
      " " + leak13 + " " + (7 to 12).map(i => s"freshx$i").mkString(" ")
    val clean = goodText("cleanword")
    import spark.implicits._
    Seq((100L, benchText)).toDF("doc_id", "text").write.parquet(benchDir)
    writeJsonlGz(docsDir, "r1.jsonl.gz", Seq(doc(1, paraphrase), doc(2, clean)))
    val q = Graft.curateCorpus(spark, docsDir, corpusDir, indexDir, ckpt,
      maxFilesPerTrigger = 1, compactEvery = 0,
      chunksDir = Some(chunksDir), benchDir = Some(benchDir))
    assert(q.awaitTermination(120000), "AvailableNow curation must drain and stop")
    // both docs pass curation (the paraphrase is NOT a near-dup of
    // anything curated)...
    val curated = spark.read.parquet(corpusDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated === Set(1L, 2L),
      "the contaminated doc must still be CURATED (decontamination gates training chunks, not the corpus)")
    // ...but only the clean doc reaches the training chunks
    val chunked = spark.read.parquet(chunksDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(chunked === Set(2L),
      "a doc containing a verbatim benchmark 13-gram must never chunk")
  }

  test("corpus curation end-to-end: .jsonl.gz -> quality gate -> dedup -> compacted parquet") {
    val spark = Graft.session(cores = 4)
    val docsDir = Files.createTempDirectory("gcorpus_in").toString
    val corpusDir = Files.createTempDirectory("gcorpus_out").toString + "/corpus"
    val indexDir = Files.createTempDirectory("gcorpus_idx").toString + "/index"
    val ckpt = Files.createTempDirectory("gcorpus_ck").toString
    val (a, b, c, d, e) =
      (goodText("alpha"), goodText("beta"), goodText("gamma"), goodText("delta"), goodText("eps"))

    // run 1: three files -> three paced batches (maxFilesPerTrigger=1);
    // in-file dup (3=1), cross-file dup (6=2), quality reject (4)
    writeJsonlGz(docsDir, "a.jsonl.gz", Seq(doc(1, a), doc(2, b), doc(3, a), doc(4, "tiny doc")))
    writeJsonlGz(docsDir, "b.jsonl.gz", Seq(doc(5, c), doc(6, b)))
    writeJsonlGz(docsDir, "c.jsonl.gz", Seq(doc(7, d)))
    def run(): Unit = {
      val q = Graft.curateCorpus(spark, docsDir, corpusDir, indexDir, ckpt,
        maxFilesPerTrigger = 1, compactEvery = 2)
      assert(q.awaitTermination(120000), "AvailableNow curation must drain and stop")
    }
    run()
    val round1 = spark.read.parquet(corpusDir)
    assert(round1.select("text").collect().map(_.getString(0)).sorted
      === Array(a, b, c, d).sorted,
      "exactly one survivor per distinct text; low-quality doc gone")

    // run 2, same checkpoint: a re-duplicate of run 1 (8=a) must be
    // dropped by the PERSISTED index; the genuinely new doc survives
    writeJsonlGz(docsDir, "d.jsonl.gz", Seq(doc(8, a), doc(9, e)))
    run()
    val round2 = spark.read.parquet(corpusDir)
    assert(round2.select("text").collect().map(_.getString(0)).sorted
      === Array(a, b, c, d, e).sorted)
    assert(round2.filter("doc_id = 8").isEmpty,
      "cross-RUN duplicate must be anti-joined out by the fingerprint index")
    assert(round2.filter("doc_id = 9").count() === 1)

    // in-pipeline compaction kept the sink partition count bounded
    // (batch 2 collapsed batches 0-1 into one negative-id partition)
    def batchDirs(dir: String): Seq[String] = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).filter(_.startsWith("batch_id=")).toSeq
    }
    for (dir <- Seq(corpusDir, indexDir)) {
      val dirs = batchDirs(dir)
      assert(dirs.exists(_.stripPrefix("batch_id=").toLong < 0),
        s"$dir: compaction must have produced a merged negative-id partition (saw $dirs)")
      assert(dirs.size <= 3,
        s"$dir: partition count must stay bounded by in-pipeline compaction (saw $dirs)")
    }

    // curated rows carry the quality metrics the gate used
    assert(round2.columns.toSet === Set("doc_id", "text", "lang", "n_words", "quality_score", "batch_id"))
    assert(round2.filter("n_words < 20 or quality_score < 0.3").isEmpty)
  }

  test("curation with near-dup index: a one-word edit of a PREVIOUS run's doc is dropped") {
    val spark = Graft.session(cores = 4)
    val docsDir = Files.createTempDirectory("gnear_in").toString
    val corpusDir = Files.createTempDirectory("gnear_out").toString + "/corpus"
    val indexDir = Files.createTempDirectory("gnear_idx").toString + "/index"
    val nearDir = Files.createTempDirectory("gnear_nd").toString + "/neardup"
    val ckpt = Files.createTempDirectory("gnear_ck").toString
    val a = goodText("alpha")
    // one word changed out of 25: passes the exact-fingerprint gate,
    // must NOT pass the banded near-dup gate
    val aEdited = a.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 6) "edited" else w }.mkString(" ")
    val b = goodText("beta")
    def run(): Unit = {
      val q = Graft.curateCorpus(spark, docsDir, corpusDir, indexDir, ckpt,
        maxFilesPerTrigger = 1, compactEvery = 0, nearDupDir = Some(nearDir))
      assert(q.awaitTermination(120000), "AvailableNow curation must drain and stop")
    }
    writeJsonlGz(docsDir, "r1.jsonl.gz", Seq(doc(1, a)))
    run()
    assert(spark.read.parquet(corpusDir).count() === 1)
    val bandRows1 = spark.read.parquet(s"$nearDir/bands").count()
    assert(bandRows1 === 8L, "8 band rows per curated doc")
    assert(spark.read.parquet(s"$nearDir/sigs").count() === 1L)

    // run 2: the near-dup edit + a genuinely new doc
    writeJsonlGz(docsDir, "r2.jsonl.gz", Seq(doc(2, aEdited), doc(3, b)))
    run()
    val round2 = spark.read.parquet(corpusDir)
    assert(round2.count() === 2, "near-dup of a prior RUN must be dropped")
    assert(round2.filter("doc_id = 2").isEmpty,
      "the one-word edit must be caught by the persisted band+sig index")
    assert(round2.filter("doc_id = 3").count() === 1)

    // the index grew append-only: run 1's partition is untouched, run 2
    // added exactly its survivor's rows in a NEW batch partition
    val bands = spark.read.parquet(s"$nearDir/bands")
    assert(bands.count() === 16L, "8 rows per survivor, 2 survivors")
    assert(bands.filter(s"doc_id = 1").count() === 8L, "history partition intact")
    assert(spark.read.parquet(s"$nearDir/sigs").count() === 2L)
    val batchDirs = new java.io.File(s"$nearDir/bands").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted
    assert(batchDirs.length === 2, s"one partition per run's batch (saw ${batchDirs.toSeq})")
  }

  test("facade quantile default is the ADAPTIVE log-bucket sketch") {
    // round-14 routing contract: Graft.quantileSketch must be the
    // one-pass unknown-domain face (no [lo,hi) pre-pass, bounded state),
    // not the fixed-domain B-bucket face — the two faces bucket
    // differently, so estimate columns pin the routing
    val spark = Graft.session(cores = 4)
    val dir = "/root/testdata/sf0.001"
    val got = Graft.quantileSketch(spark, dir).collect().map(_.toString).toSeq
    val adaptive = graft.ops.QuantileSketch.quantileSketchAdaptive(spark, dir)
      .collect().map(_.toString).toSeq
    assert(got === adaptive, "facade default must route to the adaptive face")
    val fixed = Graft.quantileSketchFixed(spark, dir).collect().map(_.toString).toSeq
    assert(got !== fixed,
      "the two faces bucket differently on this fixture — equal output " +
        "would mean the routing (or the fixture) stopped discriminating")
  }

  test("vector curation end-to-end: parquet stream -> near-dup gate -> curated vectors") {
    val spark = Graft.session(cores = 4)
    import spark.implicits._
    val vecsDir = Files.createTempDirectory("gvec_in").toString
    val corpusDir = Files.createTempDirectory("gvec_out").toString + "/vecs"
    val indexDir = Files.createTempDirectory("gvec_idx").toString + "/idx"
    val ckpt = Files.createTempDirectory("gvec_ck").toString
    val base = (1 to 64).map(i => math.sin(i.toDouble).toFloat).toArray
    val other = (1 to 64).map(i => math.cos(i * 3.0).toFloat).toArray

    // run 1: a vector + its colinear copy (in-batch dup) land as files
    Seq((1L, base), (2L, base.map(_ * 2.0f)))
      .toDF("vec_id", "embedding").write.mode("append").parquet(vecsDir)
    val q1 = Graft.curateVectors(spark, vecsDir, corpusDir, indexDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(corpusDir).select("vec_id").as[Long].collect().sorted
      === Array(1L), "in-batch colinear copy dropped, min id kept")

    // run 2 (same checkpoint): a cross-RUN colinear copy + a new vector
    Seq((3L, base.map(_ * 0.5f)), (4L, other))
      .toDF("vec_id", "embedding").write.mode("append").parquet(vecsDir)
    val q2 = Graft.curateVectors(spark, vecsDir, corpusDir, indexDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(corpusDir).select("vec_id").as[Long].collect().sorted
      === Array(1L, 4L),
      "the persisted index drops the cross-run colinear copy; the novel vector survives")
    assert(spark.read.parquet(indexDir).count() === 2L, "one fixed-width index row per survivor")
  }
}
