package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Semantic checks on crafted fixtures: known duplicates and known
  * neighbors must be found (the DuckDB oracle proves engine parity; these
  * prove the operators mean what they claim). */
class OpsSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("opsfix").toString
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again today", "en", "s", 55L),
      (1L, "the quick brown fox leaps over the lazy dog again today", "en", "s", 55L),
      (2L, "completely different content about spark query engines and storage", "en", "s", 66L),
      (3L, "completely different content about spark query engines and storage", "en", "s", 66L),
      (4L, "tiny", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val base = (1 to 64).map(i => math.sin(i.toDouble).toFloat).toArray
    val scaled = base.map(x => x * 2.0f)
    val other = (1 to 64).map(i => math.cos(i * 3.0).toFloat).toArray
    Seq((0L, base, 0), (1L, scaled, 0), (2L, other, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("exact dedup groups identical texts") {
    val groups = TextDedup.exact(spark, dir).collect()
    assert(groups.length === 4) // 5 docs, one exact pair
    val dupGroup = groups.filter(_.getAs[Long]("n_dups") === 2L)
    assert(dupGroup.length === 1 && dupGroup(0).getAs[Long]("keep_id") === 2L)
  }

  test("keep-best dedup: one survivor per cluster, and it is the best-quality one") {
    val clusters = TextDedup.minhashClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val q = TextAnalysis.withQuality(TextDedup.docs(spark, dir))
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kept = TextDedup.dedupKeepBest(spark, dir).collect()
    // exactly one survivor per cluster_rep, covering every cluster
    val reps = clusters.values.map(_._1).toSet
    assert(kept.map(_.getLong(1)).toSeq.sorted === reps.toSeq.sorted)
    // the survivor's quality is the max over its cluster members
    for (r <- kept) {
      val rep = r.getLong(1)
      val members = clusters.collect { case (id, (cr, _)) if cr == rep => id }
      val best = members.map(q).max
      assert(q(r.getLong(0)) === best,
        s"cluster $rep kept ${r.getLong(0)} (q=${q(r.getLong(0))}) over max $best")
    }
  }

  test("training manifest: holdout and contaminated docs never surface, chunks consistent") {
    val td = "/root/testdata/sf0.001"
    val m = CurationPipeline.trainingManifest(spark, td).collect()
    assert(m.nonEmpty, "the sf0.001 corpus must yield a non-empty manifest")
    assert(m.forall(_.getLong(0) % 20 != 0), "benchmark holdout leaked into training")
    val d = TextDedup.docs(spark, td)
    val flagged = TextDedup.exactNgramContamination(
        d.filter(col("doc_id") % 20 =!= 0), d.filter(col("doc_id") % 20 === 0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(m.forall(r => !flagged(r.getLong(0))), "contaminated doc in manifest")
    // every manifest row chunks sanely: >= 1 chunk, each chunk non-empty
    assert(m.forall(r => r.getLong(2) >= 1 && r.getLong(3) >= r.getLong(2)))
  }

  test("curriculum manifest: exactly the survivors are banded, with survivor-only statistics") {
    val td = "/root/testdata/sf0.001"
    val surv = CurationPipeline.trainingManifest(spark, td).collect()
      .map(_.getLong(0)).toSet
    val banded = CurationPipeline.curriculumManifest(spark, td).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2), r.getInt(3))).toMap
    assert(banded.keySet === surv, "banded set must be exactly the manifest survivors")
    // phases are monotone in difficulty and the thresholds come from
    // SURVIVOR statistics: recompute mean/sigma over the banded set
    def dec6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val d6 = banded.view.mapValues(v => dec6(v._1)).toMap
    val n = d6.size
    val mean = d6.values.sum.toDouble / n
    val ex2 = d6.values.map(v => v * v).sum.toDouble / n
    val sdev = math.sqrt(ex2 - mean * mean)
    for ((id, (dd, p, sh)) <- banded) {
      val expect = if (dd < mean - sdev) 1 else if (dd < mean) 2
        else if (dd < mean + sdev) 3 else 4
      assert(p === expect, s"doc $id phase $p != survivor-stats band $expect")
      assert(sh >= 0 && sh < 16)
    }
  }

  test("leakage-free split: a near-dup cluster never straddles splits") {
    val s = TextDedup.leakageFreeSplit(spark, dir).collect()
    assert(s.length === 5, "every doc gets a split")
    val byCluster = s.groupBy(_.getLong(1))
    assert(byCluster.forall { case (_, rows) =>
      rows.map(_.getString(2)).distinct.length == 1 },
      "cluster members must share one split")
    // the near-identical pair (0,1) and the exact pair (2,3) co-travel
    val split = s.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(split(0L) === split(1L), "near-dups split apart: leakage")
    assert(split(2L) === split(3L), "exact dups split apart: leakage")
  }

  test("BPE training: greedy overlap and merge-on-merged-token rounds") {
    import spark.implicits._
    // "aaa": greedy left-to-right gives [aa, a], never [a, aa]
    val (m1, v1) = TextAnalysis.bpeTrainMerges(
      Seq((0L, "aaa aaa")).toDF("doc_id", "text"), 1)
    assert(m1 === Seq(("a", "a", 4L)))
    assert(v1.select("syms").collect()(0).getSeq[String](0) === Seq("aa", "a"))
    TextAnalysis.bpeReleaseVocab(v1)
    // round 2 merges a pair that only exists because round 1 rewrote the
    // vocab; round 3 merges TWO merged tokens
    val (m3, v3) = TextAnalysis.bpeTrainMerges(
      Seq((0L, "aaab aaab aaab")).toDF("doc_id", "text"), 3)
    assert(m3 === Seq(("a", "a", 6L), ("a", "b", 3L), ("aa", "ab", 3L)))
    assert(v3.select("syms").collect()(0).getSeq[String](0) === Seq("aaab"))
    TextAnalysis.bpeReleaseVocab(v3)
    // exhaustion: stops early once every word is a single token
    val (mx, vx) = TextAnalysis.bpeTrainMerges(
      Seq((0L, "ab ab")).toDF("doc_id", "text"), 5)
    assert(mx === Seq(("a", "b", 2L)))
    TextAnalysis.bpeReleaseVocab(vx)
  }

  test("batched BPE rounds == sequential merge list (maxBatch=1 is the oracle)") {
    import spark.implicits._
    def train(df: org.apache.spark.sql.DataFrame, n: Int, batch: Int) = {
      val (m, v) = TextAnalysis.bpeTrainMerges(df, n, maxBatch = batch)
      val vocab = v.select("word", "syms").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      TextAnalysis.bpeReleaseVocab(v)
      (m, vocab)
    }

    // overlap fixture: top-2 pairs share a token — a naive batch would
    // merge both; the disjointness filter defers the second, and the
    // deferred merge then happens against the REWRITTEN vocab ((x, ay),
    // not (x, a)) exactly like the sequential loop
    val overlap = Seq((0L, "xay xay xay")).toDF("doc_id", "text")
    val r0 = TextAnalysis.bpeMergeRounds.get()
    val (mo, _) = train(overlap, 2, batch = 8)
    assert(mo === Seq(("a", "y", 3L), ("x", "ay", 3L)),
      "overlapping second pair must defer to the next round")
    assert(TextAnalysis.bpeMergeRounds.get() - r0 === 2L,
      "overlap must cost two rounds even with batching on")
    val (ms, _) = train(overlap, 2, batch = 1)
    assert(mo === ms)

    // disjoint distinct-count pairs batch in ONE round
    val disjoint = (Seq.fill(16)("ab") ++ Seq.fill(8)("cd") ++
      Seq.fill(4)("ef") ++ Seq.fill(2)("gh")).mkString(" ")
    val dj = Seq((0L, disjoint)).toDF("doc_id", "text")
    val r1 = TextAnalysis.bpeMergeRounds.get()
    val (mb, vb) = train(dj, 4, batch = 8)
    assert(TextAnalysis.bpeMergeRounds.get() - r1 === 1L,
      "four disjoint strictly-ranked merges must take one round")
    val (msq, vsq) = train(dj, 4, batch = 1)
    assert(mb === msq && vb === vsq)

    // a count TIE at the batch boundary truncates: new pairs created by
    // the kept merges could tie the excluded candidate, so the strict
    // gap rule defers it
    val tie = (Seq.fill(3)("ab") ++ Seq.fill(3)("cd") ++
      Seq.fill(3)("ef")).mkString(" ")
    val tf = Seq((0L, tie)).toDF("doc_id", "text")
    val r2 = TextAnalysis.bpeMergeRounds.get()
    val (mt, _) = train(tf, 2, batch = 8)
    assert(mt === train(tf, 2, batch = 1)._1)
    assert(TextAnalysis.bpeMergeRounds.get() - r2 >= 2L,
      "an all-tie ranking must not batch past the first merge")

    // a self-pair (l == r) closes its batch: its merge creates pairs
    // bounded only by its own count
    val self = (Seq.fill(4)("aa") ++ Seq.fill(3)("bc")).mkString(" ")
    val sf = Seq((0L, self)).toDF("doc_id", "text")
    val (mself, _) = train(sf, 2, batch = 8)
    assert(mself === train(sf, 2, batch = 1)._1)
    assert(mself.head._1 === "a" && mself.head._2 === "a")

    // property sweep: deterministic pseudo-random corpora, batched and
    // sequential lists AND final vocabularies must agree exactly
    def h64(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    for (seed <- 1 to 3) {
      val words = (0 until 60).map { i =>
        val h = h64(s"corpus$seed:$i")
        val len = 2 + (math.abs(h) % 5).toInt
        (0 until len).map(j =>
          ('a' + (math.abs(h >> (j * 7)) % 6).toInt).toChar).mkString
      }
      val df = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      val (mBat, vBat) = train(df, 15, batch = 4)
      val (mSeq, vSeq) = train(df, 15, batch = 1)
      assert(mBat === mSeq, s"seed $seed: merge lists diverge")
      assert(vBat === vSeq, s"seed $seed: final vocab diverges")
    }
  }

  test("bpeReleaseVocab frees the final localCheckpoint cut (no session leak)") {
    import spark.implicits._
    // 12 disjoint strictly-ranked merges at maxBatch=1 -> 12 rounds,
    // crossing the CutEvery=8 localCheckpoint boundary: the returned
    // vocab is a persisted frame whose plan still references the cut
    val words = (0 until 12).map(i =>
      s"${('a' + 2 * i).toChar}${('a' + 2 * i + 1).toChar}")
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(24 - i)(w) }.mkString(" ")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (m, v) = TextAnalysis.bpeTrainMerges(
      Seq((0L, text)).toDF("doc_id", "text"), 12, maxBatch = 1)
    assert(m.size === 12)
    TextAnalysis.bpeReleaseVocab(v)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"release left persistent RDDs behind (the r12 cut leak): $leaked")
  }

  test("BPE batch selection: duplicate merged outputs close the batch (rule 5)") {
    val noAdj: Seq[String] => Set[String] = _ => Set.empty
    // the adversarial shape the corpus-level sweep cannot reach (see the
    // rule-5 note on bpeTrainMerges): token-DISJOINT candidates whose
    // merged outputs are the same string. Before the rule-5 truncation
    // the selection admitted all four (disjoint tokens, no corpus
    // collision, strict gaps) and the two "abc" rewrites would pool
    // their newly created pairs past the strict-gap bound.
    assert(TextAnalysis.bpeSelectBatch(Seq(
      ("a", "bc", 10L), ("ab", "c", 9L), ("d", "e", 8L), ("f", "g", 7L)),
      want = 4, noAdj) === 1,
      "batch must close BEFORE the second equal-output candidate")
    // same, with the colliding pair deeper in the prefix
    assert(TextAnalysis.bpeSelectBatch(Seq(
      ("x", "y", 10L), ("a", "bc", 9L), ("ab", "c", 8L), ("d", "e", 7L)),
      want = 4, noAdj) === 2)
    // the refactor preserves rules 1-4: disjoint strict-ranked prefix
    assert(TextAnalysis.bpeSelectBatch(Seq(
      ("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L), ("g", "h", 7L)),
      want = 3, noAdj) === 3)
    // (1) token overlap truncates exclusively
    assert(TextAnalysis.bpeSelectBatch(Seq(
      ("a", "b", 10L), ("b", "c", 9L), ("d", "e", 8L)),
      want = 3, noAdj) === 1)
    // (2) self-pair closes inclusively
    assert(TextAnalysis.bpeSelectBatch(Seq(
      ("a", "a", 10L), ("c", "d", 9L), ("e", "f", 8L)),
      want = 3, noAdj) === 1)
    // (3) tie at the boundary truncates
    assert(TextAnalysis.bpeSelectBatch(Seq(
      ("a", "b", 10L), ("c", "d", 9L), ("e", "f", 9L)),
      want = 2, noAdj) === 1)
    // (4) output colliding with a corpus-adjacent token truncates
    assert(TextAnalysis.bpeSelectBatch(Seq(
      ("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L)),
      want = 3, _ => Set("cd")) === 1)
  }

  test("BPE encode: token streams are lossless and consistent with the counts") {
    val toks = TextAnalysis.bpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._2) }
    val texts = TextAnalysis.docs(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("text")).toMap
    val counts = TextAnalysis.bpeTokenCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toks.keySet === texts.keySet.filter(_ < 8), "every selected doc encodes")
    toks.foreach { case (d, rs) =>
      // positions are contiguous from 0
      assert(rs.map(_._2).toSeq === (0L until rs.length).toSeq, s"doc $d positions")
      // merging never alters characters: concatenated tokens == the
      // doc's lower-cased words joined
      val stream = rs.map(_._3).mkString
      val wordsJoined = texts(d).toLowerCase.split("\\s+").filter(_.nonEmpty).mkString
      assert(stream === wordsJoined, s"doc $d token stream not lossless")
      // stream length == the tokenizer-aware count
      assert(rs.length.toLong === counts(d), s"doc $d count mismatch")
    }
  }

  test("BPE training runs once per session: merges, counts, and encode share it") {
    import spark.implicits._
    val d = Files.createTempDirectory("bpecache").toString
    Seq((0L, "shared cache shared cache", "en", "s", 25L),
        (1L, "cache the trained tokenizer", "en", "s", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val before = TextAnalysis.bpeTrainRuns.get()
    val m = TextAnalysis.bpeMerges(spark, d).collect()
    val c = TextAnalysis.bpeTokenCounts(spark, d).collect()
    val e = TextAnalysis.bpeEncode(spark, d).collect()
    assert(m.nonEmpty && c.nonEmpty && e.nonEmpty)
    assert(TextAnalysis.bpeTrainRuns.get() === before + 1,
      "three consumers must share one training run")
    // and the shared vocab gives consistent numbers across faces
    val counts = c.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamLens = e.groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.length.toLong }
    streamLens.foreach { case (id, n) => assert(counts(id) === n) }
  }

  test("persisted tokenizer: cold load never trains; OOV words merge like any tokenizer") {
    import spark.implicits._
    val d = Files.createTempDirectory("bpepersist").toString
    Seq((0L, "aaab aaab aaab", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    TextAnalysis.buildTokenizer(spark, d, numMerges = 3)
    assert(TextAnalysis.hasTokenizer(spark, d, numMerges = 3))
    assert(!TextAnalysis.hasTokenizer(spark, d, numMerges = 10),
      "a merge-count mismatch must not validate the artifact")
    // simulate a cold session: drop the in-session cache, re-access
    graft.core.SessionCache.invalidate(spark, "bpe_vocab_3", d)
    val before = TextAnalysis.bpeTrainRuns.get()
    val enc = TextAnalysis.bpeEncode(spark, d, numMerges = 3).collect()
    assert(enc.map(_.getString(2)).toSeq === Seq("aaab", "aaab", "aaab"))
    assert(TextAnalysis.bpeTrainRuns.get() === before,
      "the persisted artifact must load without a training run")
    // cross-corpus encode: "aab" never appeared in training; merges
    // [(a,a),(a,b),(aa,ab)] applied in rank order give [aa, b]
    val d2 = Files.createTempDirectory("bpeforeign").toString
    Seq((0L, "aab aaab", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val f = TextAnalysis.bpeEncodeWith(spark, d2, d, numMerges = 3).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(f.toSeq === Seq((0L, "aa"), (1L, "b"), (2L, "aaab")))
  }

  test("applyMerges (one-projection UDF) equals the per-merge fold law") {
    import spark.implicits._
    // real corpus words + adversarial shapes: overlap chains ("aaa" must
    // give [aa, a]), a later merge re-creating an earlier pair's operands
    // (("b","c") after ("a","bc") — rank order must NOT re-fire the
    // earlier rule), OOV symbols, and a word shorter than any pair
    val words = TextAnalysis.docs(spark, dir)
      .select(explode(TextHashing.words(col("text"))).as("word")).distinct()
      .union(Seq("aaa", "abcbc", "aabcc", "x").toDF("word"))
    val merges = Seq(
      ("a", "bc", 9L), ("b", "c", 7L), ("a", "a", 5L),
      ("aa", "a", 3L), ("ab", "c", 2L))
    val got = TextAnalysis.applyMerges(words, merges)
      .select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val want = TextAnalysis.applyMergesFold(words, merges)
      .select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (w, syms) => assert(syms === want(w), s"word '$w'") }
    // (a,a) gives [aa, a] (non-overlapping greedy), then (aa,a) -> [aaa]
    assert(got("aaa") === Seq("aaa"))
    // the empty word encodes to NO tokens (the old fold's sequence(1,0)
    // quirk produced ["", ""]; words() never emits empty tokens, so the
    // sensible law is the pin, not the quirk)
    val empty = TextAnalysis.applyMerges(Seq("").toDF("word"), merges)
      .select("syms").head().getSeq[String](0)
    assert(empty === Seq.empty)
  }

  test("BPE token counts match the trained vocab's symbol lengths") {
    val n = TextAnalysis.bpeTokenCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc has a row, counts are positive and at most the word-char total
    val docs = TextAnalysis.docs(spark, dir).collect()
    assert(n.size === docs.length)
    docs.foreach { r =>
      val chars = r.getAs[String]("text").toLowerCase
        .split("\\s+").filter(_.nonEmpty).map(_.length).sum
      val words = r.getAs[String]("text").split("\\s+").count(_.nonEmpty)
      val t = n(r.getAs[Long]("doc_id"))
      assert(t >= words && t <= chars,
        s"doc ${r.getAs[Long]("doc_id")}: tokens $t outside [words=$words, chars=$chars]")
    }
  }

  test("chunking: full coverage with exact overlap, no chunk past maxTokens") {
    val maxT = 5; val ov = 2; val stride = maxT - ov
    import spark.implicits._
    val d = Seq((0L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // 11 words
                (1L, "a b c"), (2L, "single")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocumentsDf(d, maxT, ov).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val c0 = out(0L).map(_.getString(2))
    assert(out(0L).forall(_.getLong(3) <= maxT), "no chunk exceeds maxTokens")
    // consecutive chunks overlap by exactly `ov` words while full
    for (Array(a, b) <- c0.sliding(2).toSeq if a.split(" ").length == maxT) {
      assert(a.split(" ").takeRight(ov).toSeq === b.split(" ").take(ov).toSeq,
        s"overlap violated between '$a' and '$b'")
    }
    // every word appears in some chunk, in order (coverage)
    val covered = c0.flatMap(_.split(" ")).distinct
    assert(covered.toSeq === (0 to 10).map(i => s"w$i"),
      s"coverage broken: ${covered.toSeq}")
    // short docs are exactly one chunk = themselves
    assert(out(1L).map(_.getString(2)).toSeq === Seq("a b c"))
    assert(out(2L).map(_.getString(2)).toSeq === Seq("single"))
  }

  test("ngram jaccard finds the near-identical and the identical pair") {
    val pairs = TextDedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSeq
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 1L && j > 0.4 })
    assert(pairs.exists { case (a, b, j) => a == 2L && b == 3L && j == 1.0 })
  }

  test("minhash-LSH catches the identical pair and verifies exactly") {
    val pairs = TextDedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((2L, 3L)))
    // every reported pair must also be a true jaccard pair (no false positives)
    val truth = TextDedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall(truth.contains))
  }

  test("simhash: identical docs have identical signatures, hamming 0") {
    val sigs = TextDedup.simhashSigs(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(2L) === sigs(3L))
    val pairs = TextDedup.simhash(spark, dir).collect()
    val p23 = pairs.find(r => r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(p23.isDefined && p23.get.getAs[Long]("hamming") === 0L)
  }

  test("repetition metrics: degenerate text spikes, short docs get the convention") {
    import spark.implicits._
    val df = Seq(
      (1L, "the the the the the", "en"),       // one bigram repeated 4x
      (2L, "a b c d e", "en"),                 // all bigrams distinct
      (3L, "word", "en"),                      // no bigrams
      (4L, "", "en"))                          // no words at all
      .toDF("doc_id", "text", "lang")
    val m = graft.ops.TextAnalysis.repetitionOf(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m(1L) === ((4L, 1.0, 0.25)), "degenerate doc: one bigram owns everything")
    assert(m(2L) === ((4L, 0.25, 1.0)), "healthy doc: uniform bigrams")
    assert(m(3L) === ((0L, 0.0, 1.0)), "single-word doc: no fabricated bigrams")
    assert(m(4L) === ((0L, 0.0, 1.0)))
  }

  test("PII redaction replaces emails/IPs/phones with typed tags and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact Bob.Smith+x@Example.COM or 10.0.0.1 or 555-123-4567 now", "en"),
      (2L, "two mails a@b.io c@d.org and versions like 1.2.3 stay", "en"),
      (3L, "clean text with no pii at all", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.TextAnalysis.redactOf(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getAs[String]("redacted"))).toMap
    assert(out(1L)._1 === 1L)
    assert(out(1L)._2 === 1L)
    assert(out(1L)._3 === 1L)
    assert(out(1L)._4 === "contact <EMAIL> or <IP> or <PHONE> now")
    assert(out(2L) === ((2L, 0L, 0L, "two mails <EMAIL> <EMAIL> and versions like 1.2.3 stay")),
      "a bare version number must not be mistaken for an IPv4")
    assert(out(3L) === ((0L, 0L, 0L, "clean text with no pii at all")))
  }

  test("ngram clusters = union-find over the exact Jaccard pair graph") {
    assertClustersMatchUnionFind(
      TextDedup.ngramJaccard(spark, dir), TextDedup.ngramClusters(spark, dir))
  }

  private def assertClustersMatchUnionFind(
      pairDf: org.apache.spark.sql.DataFrame,
      clusterDf: org.apache.spark.sql.DataFrame): Unit = {
    val pairs = pairDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = clusterDf.collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("cluster_rep"), r.getAs[Long]("cluster_size")))
      .toMap
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    assert(clusters.keySet === ids.toSet, "every doc gets a cluster row (singletons included)")
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = ids.map(i => i -> find(i)).toMap
    val sizes = roots.values.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    ids.foreach { i =>
      assert(clusters(i) === ((roots(i), sizes(roots(i)))), s"doc $i cluster mismatch")
    }
    assert(pairs.nonEmpty, "fixture must actually have near-dup pairs")
  }

  test("connected components: reliable-checkpoint mode matches localCheckpoint mode") {
    import spark.implicits._
    // adversarial shape: a 9-node chain (exercises pointer jumping over
    // several rounds), a triangle merging into it, and isolated nodes
    val edges = ((1L to 8L).map(i => (i, i + 1)) ++ Seq((8L, 20L), (20L, 21L), (21L, 8L)))
      .toDF("a", "b")
    val nodes = ((1L to 9L) ++ Seq(20L, 21L, 30L, 31L)).toDF("id")
    val local = GraphOps.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val ckptDir = Files.createTempDirectory("ccreliable").toString
    val reliable = GraphOps.connectedComponents(nodes, edges, Some(ckptDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(local === reliable, "both lineage-truncation modes must agree")
    val expected = ((1L to 9L).map(i => (i, 1L)) ++
      Seq((20L, 1L), (21L, 1L), (30L, 30L), (31L, 31L))).sorted
    assert(local === expected, "labels must be the component min id")
    // reliable mode actually wrote recoverable checkpoints
    assert(new java.io.File(ckptDir).listFiles().nonEmpty,
      "reliable mode must write to the checkpoint dir")
  }

  test("connected components with STRING ids: hashed contraction, min-string labels") {
    import spark.implicits._
    // a web-corpus shape: URL-ish string ids, no integral key anywhere
    val nodes = Seq("url/a", "url/b", "url/c", "url/x", "url/y", "url/z").toDF("id")
    val edges = Seq(("url/c", "url/b"), ("url/b", "url/a"), ("url/y", "url/x")).toDF("s", "d")
    val got = GraphOps.connectedComponentsByString(nodes, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "url/a" -> "url/a", "url/b" -> "url/a", "url/c" -> "url/a",
      "url/x" -> "url/x", "url/y" -> "url/x",
      "url/z" -> "url/z"),
      "labels must be the lexicographic MIN string id of each component")
    // the long-space contraction underneath must not leak hash order:
    // rerunning with ids whose hash order differs from lex order still
    // yields min-string labels (md5("2") < md5("1") is plausible for
    // some pair in this set; the agg+join mapping guarantees the
    // contract regardless)
    val n2 = (1 to 9).map(i => s"d$i").toDF("id")
    val e2 = (1 to 8).map(i => (s"d$i", s"d${i + 1}")).toDF("s", "d")
    val chain = GraphOps.connectedComponentsByString(n2, e2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(chain.values.toSet === Set("d1"), "one chain, rep = min string id")
  }

  test("connected components: seeded random graphs match union-find (self-loops, dups, chains)") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    val n = 300
    val ids = (0 until n).map(_ => rng.nextLong().abs % 1000000L).distinct
    // sparse random edges (forces many components + odd topologies),
    // plus a long chain, plus self-loops and duplicate edges
    val random = (1 to 220).map { _ =>
      (ids(rng.nextInt(ids.length)), ids(rng.nextInt(ids.length)))
    }
    val chain = ids.take(40).sliding(2).map(p => (p(0), p(1))).toSeq
    val edges = (random ++ chain ++ random.take(30) /* dups */).toDF("a", "b")
    val got = GraphOps.connectedComponents(ids.toDF("id"), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent ground truth
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    (random ++ chain).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    assert(got.keySet === ids.toSet)
    ids.foreach { i =>
      assert(got(i) === find(i), s"node $i: got ${got(i)}, union-find says ${find(i)}")
    }
  }

  test("connected components: hitting the iteration cap fails loudly, never mislabels") {
    import spark.implicits._
    val nodes = (1L to 20L).toDF("id")
    val edges = (1L to 19L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      GraphOps.connectedComponents(nodes, edges, maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"),
      "a capped run must throw, not silently return partial labels")
    // the same graph converges fine with the default cap
    val ok = GraphOps.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ok.forall(_._2 === 1L))
  }

  test("gate contract for degenerate text: empty text is signed, null text falls to the exact gate") {
    import spark.implicits._
    val emptyBands = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("band_key", org.apache.spark.sql.types.StringType))))
    val emptySigs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sig",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))))
    // empty + whitespace-only text: both collapse to the "" shingle, so
    // they ARE signed and dedup against each other (min id survives)
    val degenerate = Seq((1L, Some("   ")), (2L, Some("")), (3L, None: Option[String]))
      .toDF("doc_id", "text")
    val (surv, sigs) = CurationPipeline.incrementalNearDedup(degenerate, emptyBands, emptySigs)
    val kept = surv.select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L),
      "whitespace and empty text are near-dups of each other; null text passes un-signed")
    assert(sigs.select("doc_id").as[Long].collect().toSet === Set(1L),
      "the null-text doc gets NO signature rows — it is not near-dup-indexed")
    // ...and the exact gate is where null text dies: a null fp never
    // matches an equi-join, so the row cannot survive incrementalDedup
    val (exactSurv, _) = CurationPipeline.incrementalDedup(
      Seq((3L, None: Option[String])).toDF("doc_id", "text"),
      Seq.empty[String].toDF("fp"))
    assert(exactSurv.count() === 0L, "null-text rows are dropped by policy at the exact gate")
  }

  test("connected components: an edge-free graph is all singletons (no loop rounds)") {
    import spark.implicits._
    val nodes = Seq(5L, 9L, 2L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val out = GraphOps.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out === Seq((2L, 2L), (5L, 5L), (9L, 9L)),
      "every node must label itself when there is nothing to merge")
  }

  test("minhash clusters = union-find over the verified minhash pair graph") {
    assertClustersMatchUnionFind(
      TextDedup.minhashLsh(spark, dir), TextDedup.minhashClusters(spark, dir))
  }

  test("simhash clusters = connected components of the near-dup pair graph") {
    val pairs = TextDedup.simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = TextDedup.simhashClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("cluster_rep"), r.getAs[Long]("cluster_size")))
      .toMap
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    assert(clusters.keySet === ids.toSet, "one cluster row per doc")
    // independent ground truth: union-find (union-by-min) over the pairs
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = ids.map(i => i -> find(i)).toMap
    val sizes = roots.values.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    ids.foreach { i =>
      assert(clusters(i) === ((roots(i), sizes(roots(i)))), s"doc $i cluster mismatch")
    }
    // the fixture's exact pair must collapse: 3 -> rep 2
    assert(clusters(3L)._1 === 2L)
    assert(clusters(4L) === ((4L, 1L)), "singleton keeps itself")
  }

  test("simhash forest edges: subset of verified pairs, same components, forest-sized") {
    // the r15 sparsification contract: sigForestEdges must (a) emit only
    // hamming<=6 verified sig pairs, (b) preserve the components of the
    // full verified pair graph, (c) stay <= bands * uniqueSigs edges
    val sigs = TextDedup.simhashSigs(spark, dir)
    val forest = TextDedup.sigForestEdges(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val full = TextDedup.sigPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    forest.foreach { case (a, b) =>
      assert(a < b, s"forest edge ($a,$b) not in canonical orientation")
      assert(java.lang.Long.bitCount(a ^ b) <= 6, s"unverified forest edge ($a,$b)")
      assert(full.contains((a, b)), s"forest edge ($a,$b) not a verified pair")
    }
    val uniqueSigs = sigs.select("sig").distinct().collect().map(_.getLong(0))
    assert(forest.length <= TextDedup.SimHashBands * uniqueSigs.length,
      "forest must be linear in unique sigs")
    // identical components: union-find over forest == union-find over full
    def components(edges: Iterable[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(uniqueSigs.map(s => s -> s).toSeq: _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      uniqueSigs.map(s => s -> find(s)).toMap
    }
    assert(components(forest) === components(full),
      "forest sparsification changed the components")
  }

  test("simhash banding law: levels from unique-sig count, historical layout at level 0") {
    // r17 block-combination law (Manku/Jain/Das Sarma WWW'07 §3): the
    // level picks how many 8-bit blocks each band key concatenates;
    // mirrored in the DuckDB oracle by a bspec VALUES table GENERATED
    // from simhashBandSpecs, so these pins cover both engines
    import TextDedup.{simhashLevel => lvl, simhashBandSpecs => specs}
    assert(lvl(0) === 0 && lvl(1) === 0 && lvl(1024) === 0)
    assert(lvl(1024L << 12) === 0, "boundary: n = 1024*2^12 stays level 0")
    assert(lvl((1024L << 12) + 1) === 1, "one past the boundary flips to level 1")
    assert(lvl(35_000_000L) === 1, "the next decade after sf100 is level 1")
    assert(lvl(1024L << 16) === 1 && lvl((1024L << 16) + 1) === 2)
    assert(lvl(Long.MaxValue) === 2, "level 2 is the ceiling")
    // level 0 IS the historical disjoint 4x12 layout
    assert(specs(0) === Seq(Seq((0, 12)), Seq((12, 12)), Seq((24, 12)), Seq((36, 12))))
    // level 1: all C(6,2)=15 pairs of 8-bit blocks; level 2: all C(6,3)=20 triples
    assert(specs(1).length === 15 && specs(2).length === 20)
    for (l <- 0 to 2; band <- specs(l)) {
      assert(band.forall { case (sh, bits) => sh >= 0 && sh + bits <= 48 },
        s"level $l band $band must stay inside the 48-bit signature")
      assert(band.map(_._1) === band.map(_._1).sorted, "limbs in ascending bit order")
    }
    assert(specs(1).distinct === specs(1) && specs(2).distinct === specs(2))
    // per-bucket expected population stays <= TargetPop through exabyte
    // scale: keyspace per band is 2^(sum of limb widths)
    Seq(1L << 20, 1L << 26, 1L << 32, (1024L << 24)).foreach { n =>
      val bits = specs(lvl(n)).head.map(_._2).sum
      assert(n.toDouble / math.pow(2, bits) <= TextDedup.SimHashTargetPop,
        s"expected population at n=$n exceeds the target")
    }
  }

  test("simhash banding recall: guaranteed radius >= 3 at every level (the r16 overlap law lost this)") {
    // pigeonhole: a pair within the level's guaranteed radius (3/4/3
    // dirty bits) must share at least one band key. The r16 ADVICE
    // counter-example — bits 12 and 35 dirty, which the overlap law at
    // w=13 silently dropped — is pinned explicitly, then the property
    // is checked over deterministic pseudo-random pairs at each level.
    def sharesBand(level: Int, a: Long, bb: Long): Boolean =
      TextDedup.simhashBandSpecs(level).exists { limbs =>
        limbs.forall { case (sh, bits) =>
          ((a >> sh) & ((1L << bits) - 1)) === ((bb >> sh) & ((1L << bits) - 1))
        }
      }
    val adv = (1L << 12) | (1L << 35) // the ADVICE adversarial pair vs 0
    (0 to 2).foreach(l => assert(sharesBand(l, 0L, adv),
      s"level $l must catch the bits-12+35 pair"))
    val radius = Map(0 -> 3, 1 -> 4, 2 -> 3)
    val rnd = new scala.util.Random(421L) // deterministic
    for (l <- 0 to 2; _ <- 1 to 2000) {
      val sig = rnd.nextLong() & ((1L << 48) - 1)
      val nFlips = 1 + rnd.nextInt(radius(l))
      // sample nFlips DISTINCT bit positions (worst case: all flips land
      // in different blocks)
      val positions = rnd.shuffle((0 until 48).toList).take(nFlips)
      val other = positions.foldLeft(sig)((s, p) => s ^ (1L << p))
      assert(sharesBand(l, sig, other),
        s"level $l dropped a pair at hamming $nFlips (positions $positions)")
    }
  }

  test("contrastive pairs: positives are the verified near-dups, negatives leave the cluster") {
    val rows = TextDedup.contrastivePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the fixture's two true pairs: near-dup (0,1) and exact (2,3)
    assert(rows.map(t => (t._1, t._2)).toSet === Set((0L, 1L), (2L, 3L)))
    val clusters = TextDedup.minhashClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (a, b, n) =>
      assert(clusters(n) != clusters(a),
        s"negative $n shares anchor $a's cluster")
      assert(clusters(a) === clusters(b), "positive must share the cluster")
    }
    // deterministic
    val again = TextDedup.contrastivePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("quality rules: named outcomes, conjunction, and the short-doc path") {
    import spark.implicits._
    val d = Files.createTempDirectory("rules").toString
    // a doc built to PASS every rule: 50 words, mean len in range, no
    // punctuation, two distinct stopwords, no repeated bigram
    val good = "the " + (1 to 48).map(i => s"word$i").mkString(" ") + " of"
    Seq(
      (0L, good, "en", "s", good.length.toLong),
      (1L, "tiny", "en", "s", 4L), // fails count + stopwords
      (2L, ("spam ham " * 30).trim, "en", "s", 270L)) // 60 words, one bigram pair dominating
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = TextAnalysis.qualityRules(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    def f(id: Long, c: String) = r(id).getAs[Long](c)
    // flags are 0/1 and pass is their conjunction, every doc
    r.values.foreach { x =>
      val flags = Seq("r_word_count", "r_word_len", "r_symbol",
        "r_stopwords", "r_repetition").map(x.getAs[Long](_))
      assert(flags.forall(v => v == 0L || v == 1L))
      assert(x.getAs[Long]("pass") === flags.product)
    }
    assert(f(0L, "pass") === 1L, s"engineered doc must pass: ${r(0L)}")
    assert(f(1L, "r_word_count") === 0L && f(1L, "r_stopwords") === 0L)
    assert(f(2L, "r_repetition") === 0L, "templated doc must fail repetition")
    assert(f(2L, "r_word_count") === 1L)
  }

  test("dataset card: one composed panel whose legs match the standalone operators") {
    val card = TextAnalysis.datasetCard(spark, dir).collect()
    assert(card.length === 1, "fixture has a single source")
    val r = card(0)
    assert(r.getAs[String]("source") === "s")
    assert(r.getAs[Long]("n_docs") === 5L)
    // near-dup exposure must agree with the cluster operator
    val dupDocs = TextDedup.minhashClusters(spark, dir).collect()
      .count(_.getAs[Long]("cluster_size") > 1L)
    assert(r.getAs[Long]("dup_docs") === dupDocs.toLong)
    // contamination leg agrees with the standalone flagger
    val cont = TextDedup.decontamination(spark, dir)
      .select("doc_id").distinct().count()
    assert(r.getAs[Long]("contaminated_docs") === cont)
    assert(r.getAs[String]("top_lang") === "en")
    assert(r.getAs[Double]("avg_quality") > 0.0)
    // word total agrees with the per-doc scan
    val words = TextAnalysis.docs(spark, dir).collect()
      .map(_.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty)).sum
    assert(r.getAs[Long]("n_words") === words.toLong)
  }

  test("bloom decontamination == exact contamination, planted verbatim quote found") {
    import spark.implicits._
    // bench doc is exactly 13 words -> one gram; corpus doc 1 embeds it
    // verbatim inside longer text, corpus doc 2 shares nothing
    val bench = Seq((100L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa lambda mu nu and a trailing suffix"),
      (2L, "nothing shared with the benchmark at all in any window of " +
        "thirteen consecutive words whatsoever here"))
      .toDF("doc_id", "text")
    val exact = TextDedup.exactNgramContamination(corpus, bench).collect()
    val bloom = TextDedup.bloomNgramContamination(corpus, bench).collect()
    assert(exact.map(_.toSeq).toSeq === bloom.map(_.toSeq).toSeq,
      "the bloom prefilter must be lossless")
    assert(exact.length === 1 && exact(0).getLong(0) === 1L &&
      exact(0).getLong(1) === 100L && exact(0).getLong(2) === 1L)
  }

  test("bloom decontamination: empty benchmark -> schema-stable empty result") {
    import spark.implicits._
    val corpus = Seq((1L, "some words here")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextDedup.bloomNgramContamination(corpus, bench)
    assert(out.columns.toSeq === Seq("doc_id", "bench_id", "n_hits"))
    assert(out.count() === 0L)
  }

  test("bloom decontamination == exact on the fixture dir's %20 split") {
    val a = TextDedup.decontaminationNgram(spark, dir).collect().map(_.toSeq)
    val b = TextDedup.decontaminationBloom(spark, dir).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("decile drift: deciles partition the token mass, every KL is non-negative") {
    val rows = TextAnalysis.corpusDriftDeciles(spark, dir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val total = TextAnalysis.docs(spark, dir).collect()
      .map(_.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty)).sum
    assert(rows.map(_.getLong(1)).sum === total.toLong,
      "decile token counts must partition the corpus")
    // KL of proper add-one-smoothed distributions is >= 0 (up to the
    // per-term round-6 grid)
    assert(rows.forall(_.getDouble(2) >= -1e-4))
  }

  test("memorization risk: exact dups score 0, singleton doc scores 1, near-dups in between") {
    val m = TextDedup.memorizationRisk(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 2 and 3 are identical: every gram appears twice -> share 0
    assert(m(2L)._3 === 0.0 && m(3L)._3 === 0.0)
    // doc 4 is one word: its whole-text gram exists nowhere else
    assert(m(4L) === ((1L, 1L, 1.0)))
    // docs 0/1 differ by one word: shared windows df=2, the windows
    // around the differing word are unique -> strictly between
    assert(m(0L)._3 > 0.0 && m(0L)._3 < 1.0)
    assert(m(1L)._3 > 0.0 && m(1L)._3 < 1.0)
  }

  test("embedding outliers: the orthogonal vector in a tight label flags, cohesive ones don't") {
    import spark.implicits._
    val tight = (1L to 19L).map(i => (i, 0, Seq(1.0, 0.0, 0.0, 0.0)))
    val odd = Seq((20L, 0, Seq(0.0, 1.0, 0.0, 0.0)))
    val e = (tight ++ odd).toDF("vec_id", "label", "v")
    val out = Similarity.embeddingOutliersOf(e, dim = 4).collect()
    assert(out.length === 1 && out(0).getLong(0) === 20L,
      s"exactly the orthogonal vector must flag: ${out.toSeq}")
    assert(out(0).getDouble(3) > 3.0) // its z clears the gate by definition
  }

  test("distinct-n diversity: exhaustive recount, dup docs depress the share") {
    val texts = TextAnalysis.docs(spark, dir).collect()
      .map(_.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    def gramsOf(ws: Seq[String], n: Int): Seq[String] =
      if (ws.size < n) Seq(ws.mkString(" "))
      else ws.sliding(n).map(_.mkString(" ")).toSeq
    val got = TextAnalysis.distinctNgramDiversity(spark, dir).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    for (n <- Seq(1, 2, 3)) {
      val all = texts.flatMap(gramsOf(_, n))
      assert(got(n) === ((all.size.toLong, all.distinct.size.toLong)), s"n=$n")
    }
    // docs 2 and 3 are identical, so every n has duplicates: share < 1
    val shares = TextAnalysis.distinctNgramDiversity(spark, dir).collect()
      .map(_.getDouble(4))
    assert(shares.forall(s => s > 0 && s < 1))
  }

  test("pmi collocations: rare-word adjacency outranks common-word adjacency") {
    val got = TextAnalysis.pmiCollocations(spark, dir, k = 50, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // "quick brown" (both words x2) binds tighter than "the quick"
    // ("the" appears 4x, diluting the pair)
    assert(got.contains(("quick", "brown")) && got.contains(("the", "quick")))
    assert(got(("quick", "brown")) > got(("the", "quick")))
    // every emitted pair met the count floor
    val counts = TextAnalysis.pmiCollocations(spark, dir, k = 50, minCount = 2)
      .collect().map(_.getLong(2))
    assert(counts.forall(_ >= 2L))
  }

  test("oriented triangles: one per triangle, none on a square") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val t = GraphOps.orientedTriangles(tri).collect()
    assert(t.length === 1)
    assert((t(0).getLong(0), t(0).getLong(1), t(0).getLong(2)) === ((1L, 2L, 3L)))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc_a", "doc_b")
    assert(GraphOps.orientedTriangles(square).count() === 0L)
    // fixture graph: two disjoint edges -> two clusters, no triangles
    val stats = GraphOps.triangleStats(spark, dir).collect()
    assert(stats.length === 2)
    assert(stats.forall(r => r.getLong(1) === 2L && r.getLong(2) === 1L &&
      r.getLong(3) === 0L))
  }

  test("cross-source dup matrix: single-source fixture is one full-share cell") {
    val m = TextDedup.crossSourceDups(spark, dir).collect()
    assert(m.length === 1)
    assert(m(0).getString(0) === "s" && m(0).getString(1) === "s")
    assert(m(0).getLong(2) === 2L && m(0).getDouble(3) === 1.0)
  }

  test("pagerank: star center outranks leaves, exact decimal grid") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    // one iteration by hand on the n=4 grid: r0 = 0.25, base = 0.0375;
    // center receives 3 x round6(0.25/1) -> 0.0375 + 0.85*0.75 = 0.675;
    // each leaf receives round6(0.25/3) = 0.083333 ->
    // round6(0.0375 + 0.85*0.083333) = round6(0.10833305) = 0.108333
    val one = GraphOps.pagerankOf(star, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(one(1L) === 0.675)
    assert(one(2L) === 0.108333 && one(3L) === 0.108333 && one(4L) === 0.108333)
    // more iterations keep the center on top; degrees ride along
    val five = GraphOps.pagerankOf(star, iters = 5).collect()
    val byId = five.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(1L) > byId(2L))
    assert(five.find(_.getLong(0) == 1L).get.getLong(1) === 3L)
    // a 2-regular symmetric pair graph is stationary at 1/n from round 0
    val pair = Seq((10L, 11L)).toDF("doc_a", "doc_b")
    val p = GraphOps.pagerankOf(pair, iters = 3).collect()
    assert(p.forall(_.getDouble(2) === 0.5))
  }

  test("normalized exact dedup merges punctuation/casing/whitespace variants") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "HELLO WORLD."),
      (4L, "a different doc")).toDF("doc_id", "text")
    val g = TextDedup.exactNormalizedOf(d).collect()
    assert(g.length === 2)
    val hw = g.find(_.getLong(0) === 1L).get
    assert(hw.getAs[Long]("n_dups") === 3L)
    // three RAW lowercase forms merged — the catches `exact` cannot see
    assert(hw.getAs[Long]("n_raw_variants") === 3L)
    val other = g.find(_.getLong(0) === 4L).get
    assert(other.getAs[Long]("n_dups") === 1L &&
      other.getAs[Long]("n_raw_variants") === 1L)
  }

  test("cms heavy hitters: estimate never undercounts, degenerate grid counts everything") {
    val rows = TextAnalysis.cmsHeavyHitters(spark, dir, k = 50).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_count"),
        s"CMS undercounted ${r.getString(0)}")
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("cms_estimate") - r.getAs[Long]("exact_count"))
    }
    // exact ranking is by true count: "the" (4 occurrences) leads
    assert(rows.head.getString(0) === "the" && rows.head.getLong(1) === 4L)
    // d=1, w=1: every token lands in the single cell, so every
    // estimate is the total token count — the degenerate bound
    val total = TextAnalysis.docs(spark, dir).collect()
      .map(_.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty)).sum
    val degen = TextAnalysis.cmsHeavyHitters(spark, dir, d = 1, w = 1, k = 5).collect()
    assert(degen.forall(_.getAs[Long]("cms_estimate") === total.toLong))
  }

  test("tfidf keywords: repeated common word vs unique word ranked by tf x idf") {
    // fixture doc 0 (the only doc_id % 100 == 0): "the" appears twice
    // with df=2 (docs 0,1), "jumps" once with df=1, everything else
    // once with df=2 -> expect the(2 x ln 2.5) > jumps(ln 5) > the
    // word-ascending first of the ln-2.5 pack ("again")
    val rows = TextAnalysis.tfidfKeywords(spark, dir).collect()
    assert(rows.forall(_.getLong(0) % 100 === 0L))
    val d0 = rows.filter(_.getLong(0) === 0L)
      .sortBy(_.getInt(1)).map(r => (r.getString(2), r.getDouble(3)))
    assert(d0.map(_._1).toSeq === Seq("the", "jumps", "again"), d0.toSeq)
    assert(math.abs(d0(0)._2 - 1.832582) < 1e-9) // 2 x round6(ln 2.5)
    assert(math.abs(d0(1)._2 - 1.609438) < 1e-9) // round6(ln 5)
    assert(math.abs(d0(2)._2 - 0.916291) < 1e-9) // round6(ln 2.5)
  }

  test("semantic decontamination flags the vector colinear with the benchmark") {
    // fixture: vec 0 is the only benchmark vector (vec_id % 20 == 0);
    // vec 1 = 2 x vec 0 (cos exactly 1), vec 2 points elsewhere
    val flags = Similarity.semanticDecontamination(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(flags.contains((1L, 0L)), s"colinear corpus vector must flag: $flags")
    assert(math.abs(flags((1L, 0L)) - 1.0) < 1e-5)
    // no benchmark id ever appears on the corpus side and vice versa
    flags.keys.foreach { case (v, b) =>
      assert(v % 20 != 0 && b % 20 == 0, s"split leaked: ($v, $b)")
    }
    // completeness: every corpus x bench pair at-or-over threshold is
    // present (recompute exhaustively driver-side)
    val vecs = Similarity.emb(spark, dir).select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for ((v, va) <- vecs if v % 20 != 0; (b, vb) <- vecs if b % 20 == 0)
      if (math.round(cos(va, vb) * 1e6) / 1e6 >= 0.35)
        assert(flags.contains((v, b)), s"missed pair ($v, $b)")
  }

  test("embedding near-dup finds the colinear pair with cos ~ 1") {
    val pairs = Similarity.embeddingNearDup(spark, dir).collect()
    val p01 = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(p01.isDefined)
    assert(math.abs(p01.get.getAs[Double]("cos_sim") - 1.0) < 1e-5)
  }

  test("embedding near-dup nBits lever: wider buckets refine, never invent pairs") {
    def pairSet(b: Int) = Similarity.embeddingNearDup(spark, dir, nBits = b)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p4 = pairSet(4)
    val p8 = pairSet(8)
    // bits 0-3 are shared, so agreeing on 8 bits implies agreeing on 4:
    // every 8-bit pair must already be a 4-bit pair (the lever can only
    // SHED candidates), and the colinear pair (sign-identical on every
    // dim) survives any width
    assert(p8.subsetOf(p4), s"8-bit pairs not a subset: ${p8 -- p4}")
    assert(p8.contains((0L, 1L)), "colinear pair must survive narrower buckets")
  }

  test("autoNBits holds bucket population ~constant per decade") {
    // historical default preserved at the small SFs...
    assert(Similarity.autoNBits(500L) === 4)
    assert(Similarity.autoNBits(2000L) === 4)   // = 125 * 2^4 exactly
    // ...and grows ~3.3 bits per corpus decade past them
    assert(Similarity.autoNBits(2001L) === 5)   // power-of-two boundary is exact
    assert(Similarity.autoNBits(20000L) === 8)
    assert(Similarity.autoNBits(200000L) === 11)
    assert(Similarity.autoNBits(0L) === 4)
    // exact even at absurd counts (125 * 2^57 >= Long.MaxValue), still
    // under the Dim-1 sign-plane cap
    assert(Similarity.autoNBits(Long.MaxValue) === 57)
  }

  test("embedding near-dup default auto-sizes to the corpus count") {
    val n = Similarity.emb(spark, dir).count()
    val auto = Similarity.embeddingNearDup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = Similarity.embeddingNearDup(spark, dir, nBits = Similarity.autoNBits(n))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === explicit)
  }

  test("knn label propagation: the held-out vector adopts its colinear neighbor's label") {
    // fixture: vec 0 is the only held-out id (% 5 == 0); vec 1 (label 0)
    // is colinear with it and shares its sign bucket; vec 2 (label 1)
    // sits in a different bucket, so the vote basis is exactly {vec 1}
    val rows = Similarity.knnLabelPropagation(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("vec_id") === 0L)
    assert(r.getAs[Int]("pred_label") === 0)
    assert(r.getAs[Long]("votes") === 1L)
    assert(r.getAs[Long]("k_used") === 1L)
    assert(r.getAs[Int]("true_label") === 0)
  }

  test("knn label propagation: majority vote with smallest-label tie-break") {
    import spark.implicits._
    val d = Files.createTempDirectory("knnfix").toString
    // all-positive vectors share one sign bucket; cosine to the query
    // decreases with index so the 4 candidates are all within k = 5.
    // Labels (2, 2, 1, 1): a 2-2 tie must resolve to the SMALLER label.
    def vec(seed: Int): Array[Float] =
      (1 to 64).map(i => (1.0 + 0.01 * seed * math.sin(i * seed)).toFloat).toArray
    Seq((10L, vec(0), 9), (11L, vec(1), 2), (12L, vec(2), 2),
        (13L, vec(3), 1), (14L, vec(4), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = Similarity.knnLabelPropagation(spark, d).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("vec_id") === 10L)
    assert(r.getAs[Long]("k_used") === 4L)
    assert(r.getAs[Long]("votes") === 2L)
    assert(r.getAs[Int]("pred_label") === 1, "2-2 tie must take the smallest label")
    assert(r.getAs[Int]("true_label") === 9)
  }

  test("ngram duplication profile matches an exhaustive driver-side recount") {
    val prof = TextDedup.ngramDuplicationProfile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // recompute document frequencies exhaustively with the same
    // tokenization contract (lowercase, whitespace, short-doc gram)
    val texts = TextDedup.docs(spark, dir).collect().map(_.getAs[String]("text"))
    val df = scala.collection.mutable.Map.empty[String, Int]
    for (t <- texts) {
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val grams = if (ws.isEmpty) Set.empty[String]
        else if (ws.length < 3) Set(ws.mkString(" "))
        else ws.sliding(3).map(_.mkString(" ")).toSet
      grams.foreach(g => df(g) = df.getOrElse(g, 0) + 1)
    }
    val expected = df.values.groupBy {
      case 1 => "1_unique"
      case d if d <= 5 => "2_2-5"
      case d if d <= 10 => "3_6-10"
      case _ => "4_11plus"
    }.map { case (b, ds) => b -> (ds.size.toLong, ds.map(_.toLong).sum) }
    assert(prof.keySet === expected.keySet)
    for ((b, (ng, no)) <- expected) {
      assert(prof(b)._1 === ng, s"bucket $b gram count")
      assert(prof(b)._2 === no, s"bucket $b occurrence count")
    }
    // shares partition the distinct-gram mass
    assert(math.abs(prof.values.map(_._3).sum - 1.0) < 1e-4)
  }

  test("mmr rerank trades relevance for diversity exactly as the greedy recipe says") {
    import spark.implicits._
    val d = Files.createTempDirectory("mmrfix").toString
    // query = e1; a, b are near-copies of each other (cos(a,b) ~ 0.999)
    // with rels 0.95 / 0.94; c is less relevant (0.75) but far from a.
    // Plain top-2 = {a, b}; MMR(lambda = 0.7) must pick c at rank 2:
    //   score(b) = 0.7*0.94 - 0.3*cos(a,b) ~ 0.358
    //   score(c) = 0.7*0.75 - 0.3*cos(a,c) ~ 0.373
    def unit(parts: (Int, Double)*): Array[Float] = {
      val v = Array.fill(64)(0.0)
      parts.foreach { case (i, x) => v(i) = x }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val sa = math.sqrt(1 - 0.95 * 0.95)
    val sb = math.sqrt(1 - 0.94 * 0.94)
    Seq((0L, unit(0 -> 1.0), 0),
        (1L, unit(0 -> 0.95, 1 -> sa), 0),
        (2L, unit(0 -> 0.94, 1 -> sb), 0),
        (3L, unit(0 -> 0.75, 1 -> -0.66), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = Similarity.mmrTopK(spark, d, qids = Seq(0L), k = 3).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got(1) === 1L, "rank 1 is pure relevance")
    assert(got(2) === 3L, "rank 2 must trade the near-copy for the diverse doc")
    assert(got(3) === 2L, "the near-copy still surfaces once diversity is paid")
    // degenerate lambda = 100%: pure relevance order restored
    val rel = Similarity.mmrTopK(spark, d, qids = Seq(0L), k = 3,
        lamHundredths = 100).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(rel === Map(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("cluster-balanced sample covers every cluster with contiguous deterministic ranks") {
    val rows = Similarity.clusterBalancedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // perCluster = 10 exceeds every fixture cluster: the sample is the
    // whole corpus, once each
    assert(rows.map(_._1).sorted === Seq(0L, 1L, 2L))
    // ranks are 1..size within each cluster
    for ((_, members) <- rows.groupBy(_._2))
      assert(members.map(_._3).sorted === (1 to members.length).toSeq)
    // deterministic: a second run picks the identical sample
    val again = Similarity.clusterBalancedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.sortBy(_._1) === again.sortBy(_._1))
  }

  test("hll sketch is insensitive to duplication and matches an exact recount") {
    val rows = TextAnalysis.hllGramCardinality(spark, dir).collect()
    assert(rows.nonEmpty)
    // the exact leg really is exact: recount driver-side
    val texts = TextDedup.docs(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val expected = texts.groupBy(_._1).map { case (s, ts) =>
      s -> ts.flatMap { case (_, t) =>
        val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (ws.isEmpty) Seq.empty
        else if (ws.length < 3) Seq(ws.mkString(" "))
        else ws.sliding(3).map(_.mkString(" ")).toSeq
      }.distinct.size.toLong
    }
    for (r <- rows)
      assert(r.getAs[Long]("exact_distinct") === expected(r.getAs[String]("source")))
    // the DEFINING sketch property: duplicating every document changes
    // nothing — registers are maxes over hashed grams, multiplicity-blind
    val d2 = Files.createTempDirectory("hllfix").toString
    val docsDf = TextDedup.docs(spark, dir)
    docsDf.union(docsDf).write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val dup = TextAnalysis.hllGramCardinality(spark, d2).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_registers"), r.getAs[Double]("est_distinct"))).toMap
    for (r <- rows)
      assert(dup(r.getAs[String]("source")) ===
        (r.getAs[Long]("n_registers"), r.getAs[Double]("est_distinct")))
  }

  test("hard negatives: semantically-closest out-of-cluster vector, never the positive") {
    import spark.implicits._
    val d = Files.createTempDirectory("hnegfix").toString
    // docs 0/1 are the near-dup pair; 2 and 3 are distinct singletons
    Seq((0L, "the quick brown fox jumps over the lazy dog again today", "en", "s", 55L),
        (1L, "the quick brown fox leaps over the lazy dog again today", "en", "s", 55L),
        (2L, "completely different content about spark query engines and storage", "en", "s", 66L),
        (3L, "unrelated text on streaming watermarks and checkpoint recovery", "en", "s", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // embeddings: 0 and 1 colinear (one cluster); 2 shares 0's sign
    // bucket but is NOT its duplicate (the intended hard negative);
    // 3 lives in another bucket entirely
    val base = (1 to 64).map(i => math.sin(i.toDouble).toFloat).toArray
    val near = base.zipWithIndex.map { case (x, i) =>
      (x + (if (i % 7 == 0) 0.05f * math.signum(x) else 0.0f)) }
    val far = (1 to 64).map(i => -math.sin(i.toDouble).toFloat).toArray
    Seq((0L, base, 0), (1L, base.map(_ * 2.0f), 0), (2L, near, 1), (3L, far, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = TextDedup.contrastiveHardNegatives(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.contains((0L, 1L)), s"the near-dup pair must surface: $rows")
    assert(rows((0L, 1L)) === 2L,
      "the hard negative is the close-but-out-of-cluster vector, not the positive")
    // the negative is never inside the anchor's cluster
    val clusters = TextDedup.minhashClusters(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (((a, _), n) <- rows)
      assert(clusters(n) !== clusters(a), s"negative $n shares $a's cluster")
  }

  test("length buckets: ceil-power-of-two assignment, waste identity holds") {
    val rows = TextAnalysis.lengthBuckets(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val lens = TextDedup.docs(spark, dir).collect()
      .map(_.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty).toLong)
      .filter(_ > 0)
    def ceilPow2(n: Long): Long = { var b = 1L; while (b < n) b <<= 1; b }
    val expected = lens.groupBy(ceilPow2).view
      .mapValues(ls => (ls.length.toLong, ls.sum)).toMap
    assert(rows.map(_._1).toSet === expected.keySet)
    for ((b, (nd, wm, pm, ws)) <- rows) {
      assert((nd, wm) === expected(b))
      assert(pm === b * nd, "padded mass identity")
      assert(math.abs(ws - (pm - wm).toDouble / pm) < 1e-6)
    }
  }

  test("charset stats: planted mojibake and control chars are counted exactly") {
    import spark.implicits._
    val d = Files.createTempDirectory("charfix").toString
    // 2 non-ASCII (é, ñ), 1 control (), 2 replacement chars
    Seq((0L, "café niño", "en", "s", 9L),
        (1L, "badctl ��", "en", "s", 9L),
        (2L, "plain ascii only", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = TextAnalysis.charsetStats(spark, d).collect()
    assert(r.length === 1)
    val row = r.head
    // é, ñ and the two U+FFFD are all non-ASCII (4 total)
    assert(row.getAs[Long]("non_ascii") === 4L)
    assert(row.getAs[Long]("control_chars") === 1L)
    assert(row.getAs[Long]("replacement_chars") === 2L)
  }

  test("domain reweighting: single-source corpus takes the whole budget") {
    val rows = TextAnalysis.domainReweight(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Double]("weight") === 1.0)
    assert(r.getAs[Long]("quota") === 1000L)
    assert(r.getAs[Long]("n_docs") === 5L)
  }

  test("domain reweighting: harder domains get proportionally more budget, quotas never oversubscribe") {
    import spark.implicits._
    val d = Files.createTempDirectory("dorefix").toString
    // srcA repeats one word (low surprisal); srcB is all-novel words
    val docsA = (0L until 4L).map(i => (i * 2, "common common common common", "en", "a", 27L))
    val docsB = (0L until 4L).map(i => (i * 2 + 1,
      s"novel${i}x novel${i}y novel${i}z novel${i}w", "en", "b", 27L))
    (docsA ++ docsB).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val w = TextAnalysis.domainReweight(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("weight"), r.getAs[Long]("quota"))).toMap
    assert(w("b")._1 > w("a")._1, "the novel-word domain must out-weigh the repetitive one")
    assert(math.abs(w.values.map(_._1).sum - 1.0) < 1e-4)
    assert(w.values.map(_._2).sum <= 1000L, "floor quotas never oversubscribe")
  }

  test("corpus drift: identical halves sit near zero, disjoint halves far above") {
    import spark.implicits._
    val d = Files.createTempDirectory("driftfix").toString
    // stable: both halves draw the same text; drifted: the halves share
    // no vocabulary at all
    val stable = (0L until 8L).map(i => (i, "alpha beta gamma delta", "en", "stable", 22L))
    val drifted = (0L until 8L).map(i => (100L + i,
      if (i % 2 == 0) "oldword1 oldword2 oldword3 oldword4"
      else "newword1 newword2 newword3 newword4", "en", "drifted", 35L))
    (stable ++ drifted).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val k = TextAnalysis.corpusDrift(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("kl_ab"), r.getAs[Double]("kl_ba"))).toMap
    assert(k("stable")._1 < 0.01 && k("stable")._2 < 0.01)
    assert(k("drifted")._1 > 0.5 && k("drifted")._2 > 0.5)
    // smoothed KL of proper distributions is nonnegative (mod rounding)
    assert(k.values.forall(t => t._1 > -1e-4 && t._2 > -1e-4))
  }

  test("bpe fertility: more merges never raise tokens-per-word, totals tie out") {
    val f10 = TextAnalysis.bpeFertility(spark, dir, numMerges = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val f1 = TextAnalysis.bpeFertility(spark, dir, numMerges = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(f10.nonEmpty)
    for ((src, (nw, nt, fert)) <- f10) {
      assert(fert >= 1.0, "a word is never fewer than one token")
      assert(nt >= nw)
      // merges only ever SHRINK a word's symbol count
      assert(fert <= f1(src) + 1e-9, s"$src: 10-merge fertility ${fert} > 1-merge ${f1(src)}")
    }
    // n_words ties out against the corpus word count
    val words = TextDedup.docs(spark, dir).collect()
      .map(_.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty)).sum
    assert(f10.values.map(_._1).sum === words.toLong)
  }

  test("curriculum assignment: identical texts share difficulty and phase, bands are monotone") {
    val rows = TextAnalysis.curriculumAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2), r.getInt(3))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // the exact duplicates (2, 3) must land identically
    assert(rows(2L)._1 === rows(3L)._1)
    assert(rows(2L)._2 === rows(3L)._2)
    // phases are 1..4 and MONOTONE in difficulty
    val byDiff = rows.values.toSeq.sortBy(_._1)
    assert(byDiff.forall(t => t._2 >= 1 && t._2 <= 4))
    assert(byDiff.map(_._2) === byDiff.map(_._2).sorted, "phase must not decrease with difficulty")
    // shards within range
    assert(rows.values.forall(t => t._3 >= 0 && t._3 < 16))
  }

  test("token entropy matches an exhaustive driver-side recount") {
    val rows = TextAnalysis.tokenEntropy(spark, dir).collect()
    assert(rows.length === 1, "fixture has one source")
    val r = rows.head
    val ws = TextDedup.docs(spark, dir).collect()
      .flatMap(_.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty))
    val cnt = ws.groupBy(identity).view.mapValues(_.length).toMap
    val n = ws.length
    assert(r.getAs[Long]("n_tokens") === n.toLong)
    assert(r.getAs[Long]("vocab") === cnt.size.toLong)
    val ent = cnt.values.map { c =>
      BigDecimal(-(c.toDouble / n) * math.log(c.toDouble / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(math.abs(r.getAs[Double]("entropy_nats") - ent.toDouble) < 1e-9)
    assert(r.getAs[Double]("top_share") ===
      BigDecimal(cnt.values.max.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("brute-force top-k ranks the colinear vector first") {
    val top = Similarity.bruteForceTopK(spark, dir)
      .filter(col("qid") === 0).collect()
    assert(top.head.getAs[Long]("vec_id") === 1L)
  }

  test("incremental embedding near-dup: colinear vectors are caught within batch and across runs") {
    import spark.implicits._
    val base = (1 to 64).map(i => math.sin(i.toDouble).toFloat).toArray
    val ortho = (1 to 64).map(i => math.cos(i * 3.0).toFloat).toArray
    val emptyIdx = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bkt", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("nrm", org.apache.spark.sql.types.DoubleType))))
    // batch 1: base + its scaled copy (cos = 1, bigger id loses) + an unrelated vec
    val b1 = Seq((10L, base), (11L, base.map(x => x * 2.0f)), (12L, ortho))
      .toDF("vec_id", "embedding")
    val (s1, rows1) = Similarity.incrementalNearDup(b1, emptyIdx, threshold = 0.9)
    assert(s1.select("vec_id").as[Long].collect().sorted === Array(10L, 12L))
    assert(rows1.count() === 2, "one fixed-width index row per survivor")
    // batch 2: a re-scaled copy of INDEXED 10, and a genuinely new vector
    val fresh = (1 to 64).map(i => math.sin(i * 7.0 + 1.3).toFloat).toArray
    val b2 = Seq((20L, base.map(x => x * 3.0f)), (21L, fresh))
      .toDF("vec_id", "embedding")
    val (s2, _) = Similarity.incrementalNearDup(b2, rows1, threshold = 0.9)
    assert(s2.select("vec_id").as[Long].collect().sorted === Array(21L),
      "the colinear copy of an indexed vector must be dropped across runs")
    // replay safety: own rows already indexed -> same survivors
    val (s1b, _) = Similarity.incrementalNearDup(b1, rows1, threshold = 0.9)
    assert(s1b.select("vec_id").as[Long].collect().sorted === Array(10L, 12L))
  }

  test("incremental embedding near-dup: nBits is the index contract, colinear dups caught at any width") {
    import spark.implicits._
    val base = (1 to 64).map(i => math.sin(i.toDouble).toFloat).toArray
    val emptyIdx = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bkt", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("nrm", org.apache.spark.sql.types.DoubleType))))
    val b1 = Seq((10L, base)).toDF("vec_id", "embedding")
    val b2 = Seq((20L, base.map(x => x * 3.0f))).toDF("vec_id", "embedding")
    for (bits <- Seq(4, 10, 14)) {
      // a colinear copy shares EVERY sign plane, so it lands in its
      // source's bucket at any nBits — widening the index can never
      // lose the exact/colinear-duplicate class
      val (_, rows1) = Similarity.incrementalNearDup(b1, emptyIdx, threshold = 0.9, nBits = bits)
      val (s2, _) = Similarity.incrementalNearDup(b2, rows1, threshold = 0.9, nBits = bits)
      assert(s2.count() === 0L, s"colinear copy must be dropped at nBits=$bits")
      // the persisted bkt is nBits-dependent: at wider nBits the stored
      // bucket ids exceed the 4-bit range, so a mismatched reader would
      // probe the wrong buckets — which is exactly why nBits is pinned
      // per index like threshold
      if (bits > 4) {
        val maxBkt = rows1.agg(org.apache.spark.sql.functions.max("bkt")).head().getLong(0)
        assert(maxBkt >= 16L || bits == 4,
          s"fixture vector must exercise planes above bit 4 (got bkt=$maxBkt)")
      }
    }
    // autoNBits is the sizing rule the replay face applies: it holds
    // bucket population ~constant (pop <= 125 once past the 4-bit floor)
    assert(Similarity.autoNBits(500) === 4)
    assert(Similarity.autoNBits(2000) === 4, "gate-scale corpora stay on the legacy width")
    assert(Similarity.autoNBits(2000000) === 14)
  }

  test("persisted IVF index: trained quantizer, cold sessions probe the files with zero training") {
    val live = Similarity.ivfTopK(spark, dir).collect()
    assert(live.nonEmpty)
    val idxPath = Similarity.ivfIndexPath(dir)
    try {
      Similarity.buildIvfIndex(spark, dir)
      assert(new java.io.File(idxPath).exists(), "quantizer parquet must be written")
      assert(new java.io.File(Similarity.ivfPostingsPath(dir)).exists(),
        "posting lists must be written")
      // a COLD session must serve identical results straight from the
      // persisted index — and run NO k-means training at all
      val trainedSoFar = Similarity.kmeansRuns.get()
      val s2 = spark.newSession()
      val cold = Similarity.ivfTopK(s2, dir).collect()
      assert(cold.map(_.toString).toSeq === live.map(_.toString).toSeq,
        "persisted and in-session quantizers must agree bit-for-bit")
      assert(Similarity.kmeansRuns.get() === trainedSoFar,
        "a cold session with a persisted index must not train")
      // the scale claim made concrete: probe planning pushes the probed
      // cluster ids as a LITERAL partition filter, so the posting-list
      // scan reads only those c_id partitions (static pruning — no
      // dependence on the dynamic-pruning benefit heuristic)
      val coldPlan = Similarity.ivfTopK(s2, dir).queryExecution.executedPlan.toString
      assert(coldPlan.toLowerCase.contains("partitionfilters: [c_id"),
        s"persisted-postings probe must carry a c_id partition filter:\n$coldPlan")
      // behavioral proof the files ARE the probe source: permute the
      // quantizer's cluster ids and a fresh session must follow the
      // doctored file — impossible if the quantizer were re-derived
      val schema = spark.read.parquet(idxPath).schema
      val rows = spark.read.parquet(idxPath).collect()
      val ids = rows.map(_.getInt(0)).sorted
      assert(ids.length >= 2, "fixture must produce at least two clusters")
      val next = ids.zip(ids.tail :+ ids.head).toMap
      val swapped = rows.map(r => org.apache.spark.sql.Row(
        next(r.getInt(0)), r.getSeq[Double](1)))
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(swapped: _*)),
        schema).coalesce(1).write.mode("overwrite").parquet(idxPath)
      val s3 = spark.newSession()
      val fromDoctored = Similarity.ivfTopK(s3, dir).collect()
      assert(fromDoctored.map(_.toString).toSeq !== live.map(_.toString).toSeq,
        "a doctored quantizer must change the probe — proves no silent re-training")
      assert(Similarity.kmeansRuns.get() === trainedSoFar,
        "the doctored probe must not retrain either")
    } finally {
      // ALWAYS remove the (possibly doctored) index — a leftover file
      // would silently corrupt every later test/session reading this dir
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(idxPath))
      rm(new java.io.File(Similarity.ivfPostingsPath(dir)))
      Similarity.invalidateIvf(spark, dir)
    }
  }

  test("product quantization: 32-bit codes, deterministic across sessions, sane ADC scores") {
    val d = "/root/testdata/sf0.01"
    val codes = Similarity.pqCodes(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes.size === 500, "one packed code per vector")
    assert(codes.values.forall(c => c >= 0L && c < (1L << 32)),
      "8 x 4-bit sub-codes must fit 32 bits (128x compression vs 64 doubles)")
    val live = Similarity.pqTopK(spark, d).collect()
    assert(live.length === 15)
    // retraining in a fresh session reproduces codes AND rankings exactly
    val s2 = spark.newSession()
    val cold = Similarity.pqTopK(s2, d).collect()
    assert(cold.map(_.toString).toSeq === live.map(_.toString).toSeq,
      "deterministic k-means codebooks must reproduce bit-for-bit")
    // ADC approximation sanity: every approx_sim is a valid cosine-like
    // value, and the PQ ranking overlaps the exact ranking (recall floor
    // measured properly in AnnRecall / docs/SCALING.md)
    assert(live.forall(r => math.abs(r.getAs[Double]("approx_sim")) <= 1.5))
    val truth = Similarity.bruteForceTopKFor(spark, d, Similarity.QueryIds.map(_.toLong), 5)
    val recall = Similarity.recallAtK(
      Similarity.pqTopK(spark, d).withColumnRenamed("approx_sim", "cos_sim"), truth)
    assert(recall >= 0.2, s"PQ recall collapsed on the fixture: $recall")
  }

  test("persisted PQ index: cold sessions read codebooks + codes with zero training") {
    val live = Similarity.pqTopK(spark, dir).collect()
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
    try {
      Similarity.buildPqIndex(spark, dir)
      assert(new java.io.File(Similarity.pqIndexPath(dir)).exists())
      assert(new java.io.File(Similarity.pqCodesPath(dir)).exists())
      val before = Similarity.pqTrainRuns.get()
      val s2 = spark.newSession()
      val cold = Similarity.pqTopK(s2, dir).collect()
      assert(cold.map(_.toString).toSeq === live.map(_.toString).toSeq,
        "persisted codebooks/codes must reproduce the in-session results bit-for-bit")
      assert(Similarity.pqTrainRuns.get() === before,
        "a cold session with a persisted PQ index must not train")
      // crashed-build window: codes present, codebook marker absent ->
      // a fresh session retrains instead of trusting partial codes
      rm(new java.io.File(Similarity.pqIndexPath(dir)))
      val s3 = spark.newSession()
      val recovered = Similarity.pqTopK(s3, dir).collect()
      assert(Similarity.pqTrainRuns.get() === before + 1,
        "codes without the commit marker must trigger retraining")
      assert(recovered.map(_.toString).toSeq === live.map(_.toString).toSeq)
    } finally {
      rm(new java.io.File(Similarity.pqIndexPath(dir)))
      rm(new java.io.File(Similarity.pqCodesPath(dir)))
      Similarity.invalidatePq(spark, dir)
    }
  }

  test("ANN recall: levers are monotone and clear measured floors on the real corpus") {
    // hash-determinism proves engine parity; THIS measures retrieval
    // quality. Floors are the sf0.01 measurements (AnnRecall tool,
    // docs/SCALING.md) minus a safety margin; the monotonicity asserts
    // are structural (each lever only ever widens the candidate set).
    val d = "/root/testdata/sf0.01"
    val qids = (0L until 50L).toSeq
    val truth = Similarity.bruteForceTopKFor(spark, d, qids, 5)
    truth.persist().count()
    def rec(df: org.apache.spark.sql.DataFrame): Double = Similarity.recallAtK(df, truth)
    try {
      assert(rec(Similarity.bruteForceTopKFor(spark, d, qids, 5)) === 1.0,
        "brute force IS the ground truth")
      val lsh1 = rec(Similarity.lshTopKFor(spark, d, qids, 5))
      val multi = rec(Similarity.lshMultiProbeTopKFor(spark, d, qids, 5))
      val t4 = rec(Similarity.lshMultiTableTopKFor(spark, d, qids, 5, nTables = 4))
      val t8 = rec(Similarity.lshMultiTableTopKFor(spark, d, qids, 5, nTables = 8))
      val ivf1 = rec(Similarity.ivfTopKFor(spark, d, qids, 5, nprobe = 1))
      val ivf2 = rec(Similarity.ivfTopKFor(spark, d, qids, 5, nprobe = 2))
      val ivf4 = rec(Similarity.ivfTopKFor(spark, d, qids, 5, nprobe = 4))
      assert(multi >= lsh1, "multi-probe candidates are a superset of single-bucket")
      assert(t8 >= t4, "more tables can only widen the candidate union")
      assert(ivf2 >= ivf1 && ivf4 >= ivf2, "larger nprobe scans strictly more clusters")
      assert(multi >= 0.40, s"multi-probe recall regressed: $multi")
      assert(t8 >= 0.55, s"8-table recall regressed: $t8")
      assert(ivf4 >= 0.60, s"ivf nprobe=4 recall regressed: $ivf4")
      assert(ivf1 > lsh1,
        "the trained quantizer must beat raw sign buckets at the same scan fraction")
      // PQ rerank: hits(rerank of shortlist S) = |truth ∩ S|, and the
      // ADC top-5 ⊆ top-20 shortlist ⊆ top-40 shortlist — so both gains
      // are STRUCTURAL, not just measured (any true top-5 neighbor
      // inside the shortlist outranks every non-truth candidate in the
      // exact pass, so it always survives to the reranked top-5)
      val pqAdc = rec(Similarity.pqTopKFor(spark, d, qids, 5)
        .withColumnRenamed("approx_sim", "cos_sim"))
      val pqr20 = rec(Similarity.pqTopKReranked(spark, d, qids, 5, shortlist = 20))
      val pqr40 = rec(Similarity.pqTopKReranked(spark, d, qids, 5, shortlist = 40))
      assert(pqr20 >= pqAdc, "rerank of a shortlist ⊇ ADC top-5 cannot lose hits")
      assert(pqr40 >= pqr20, "a wider shortlist cannot lose hits")
      assert(pqr20 >= 0.40, s"pq+rerank(20) recall regressed: $pqr20 (measured 0.504)")
      val ivfpq2 = rec(Similarity.ivfPqTopKFor(spark, d, qids, 5, nprobe = 2, shortlist = 20))
      val ivfpq4 = rec(Similarity.ivfPqTopKFor(spark, d, qids, 5, nprobe = 4, shortlist = 40))
      assert(ivfpq2 >= 0.35, s"ivfpq(2,20) recall regressed: $ivfpq2 (measured 0.464)")
      assert(ivfpq4 >= 0.50, s"ivfpq(4,40) recall regressed: $ivfpq4 (measured 0.628)")
      // residual encoding resolves finer in-cluster distances with the
      // same 32-bit budget — measured 0.488/0.676 vs raw-coded
      // 0.464/0.628, i.e. >= 90% of the nprobe-matched IVF ceilings
      val res2 = rec(Similarity.ivfPqResidualTopKFor(spark, d, qids, 5, nprobe = 2, shortlist = 20))
      val res4 = rec(Similarity.ivfPqResidualTopKFor(spark, d, qids, 5, nprobe = 4, shortlist = 40))
      assert(res2 >= 0.40, s"residual ivfpq(2,20) recall regressed: $res2 (measured 0.488)")
      assert(res4 >= 0.55, s"residual ivfpq(4,40) recall regressed: $res4 (measured 0.676)")
    } finally truth.unpersist()
  }

  test("planAnn picks the cheapest lever setting clearing the recall target, deterministically") {
    val d = "/root/testdata/sf0.01"
    // the naive setting is brute force (scan fraction 1.0): the chosen
    // plan must clear the target at a STRICTLY smaller scan fraction
    val plan = Similarity.planAnn(spark, d, targetRecall = 0.5)
    assert(plan.calibratedRecall >= 0.5,
      s"chosen plan misses its own target: $plan")
    assert(plan.scanFraction < 1.0,
      s"a sublinear setting clears 0.5 on this corpus (ivf nprobe=2 measured 0.54): $plan")
    // deterministic: same corpus, same target -> same plan, same measurement
    assert(Similarity.planAnn(spark, d, targetRecall = 0.5) === plan)
    // the ladder is cost-ordered, so a higher target can never pick a
    // cheaper setting
    val low = Similarity.planAnn(spark, d, targetRecall = 0.2)
    assert(low.scanFraction <= plan.scanFraction)
    assert(low.calibratedRecall >= 0.2)
    // round 9: a near-exact contract that used to fall back to the full
    // scan is now served sublinearly by the SQ8 rerank rung (byte
    // fraction 4/16, measured recall 1.0 on this corpus)
    val exact = Similarity.planAnn(spark, d, targetRecall = 0.99)
    assert(exact.calibratedRecall >= 0.99, s"plan misses 0.99: $exact")
    assert(exact.scanFraction < 1.0, s"0.99 should no longer need brute: $exact")
    // ... and the rung that serves it is SPECIFICALLY the SQ8 rerank:
    // every cheaper rung (lsh, ivf probes, pq/ivfpq shortlists) misses
    // 0.99 on this corpus, so sq_rerank is the measured-cheapest pick
    assert(exact.method === "sq_rerank",
      s"the near-exact contract must land on the SQ8 rerank rung: $exact")
    // ladder-exhausted fallback mechanics: no candidates -> exact scan
    val fb = Similarity.planAnnWith(Seq.empty, spark, d, targetRecall = 0.5)
    assert(fb.method === "brute" && fb.scanFraction === 1.0)
    // the plan is runnable for OTHER queries than the calibration set
    val served = Similarity.runAnnPlan(spark, d, plan, Seq(100L, 101L), k = 5)
    assert(served.select("qid").distinct().count() === 2)
  }

  test("persisted IVF+PQ composed index: pruned probe, zero cold-session training, crash recovery") {
    val live = Similarity.ivfPqTopK(spark, dir).collect()
    assert(live.nonEmpty)
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
    try {
      Similarity.buildIvfPqIndex(spark, dir)
      assert(new java.io.File(Similarity.ivfPqPostingsPath(dir)).exists(),
        "code-bearing posting lists must be written")
      assert(new java.io.File(Similarity.ivfIndexPath(dir)).exists(),
        "centroid marker must be written")
      assert(new java.io.File(Similarity.pqIndexPath(dir)).exists(),
        "codebook marker must be written")
      // a cold session serves identical results with ZERO training of
      // either quantizer
      val km = Similarity.kmeansRuns.get()
      val pq = Similarity.pqTrainRuns.get()
      val s2 = spark.newSession()
      val cold = Similarity.ivfPqTopK(s2, dir).collect()
      assert(cold.map(_.toString).toSeq === live.map(_.toString).toSeq,
        "persisted composed index must reproduce in-session results bit-for-bit")
      assert(Similarity.kmeansRuns.get() === km, "cold session must not train the coarse quantizer")
      assert(Similarity.pqTrainRuns.get() === pq, "cold session must not train the codebooks")
      // the probe is statically partition-pruned to the probed c_ids
      val coldPlan = Similarity.ivfPqTopK(s2, dir).queryExecution.executedPlan.toString
      assert(coldPlan.toLowerCase.contains("partitionfilters: [c_id"),
        s"composed-index probe must carry a c_id partition filter:\n$coldPlan")
      // crash window: postings + centroids committed, codebook marker
      // (written LAST) absent -> a fresh session retrains the codebooks
      // and ignores the composed postings, still reproducing the values
      rm(new java.io.File(Similarity.pqIndexPath(dir)))
      val s3 = spark.newSession()
      val recovered = Similarity.ivfPqTopK(s3, dir).collect()
      assert(Similarity.pqTrainRuns.get() === pq + 1,
        "missing codebook marker must trigger codebook retraining")
      assert(recovered.map(_.toString).toSeq === live.map(_.toString).toSeq)
    } finally {
      rm(new java.io.File(Similarity.ivfPqPostingsPath(dir)))
      rm(new java.io.File(Similarity.ivfIndexPath(dir)))
      rm(new java.io.File(Similarity.pqIndexPath(dir)))
      Similarity.invalidateIvf(spark, dir)
      Similarity.invalidatePq(spark, dir)
    }
  }

  test("a crashed index build (postings without the centroid marker) is ignored, not probed") {
    val live = Similarity.ivfTopK(spark, dir).collect()
    try {
      Similarity.buildIvfIndex(spark, dir)
      // simulate the crash window: postings committed, centroids (the
      // commit marker, written LAST) never published
      def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
      rm(new java.io.File(Similarity.ivfIndexPath(dir)))
      Similarity.invalidateIvf(spark, dir)
      val before = Similarity.kmeansRuns.get()
      val s2 = spark.newSession()
      val recovered = Similarity.ivfTopK(s2, dir).collect()
      assert(Similarity.kmeansRuns.get() === before + 1,
        "without the commit marker the session must retrain, not trust the partial index")
      assert(recovered.map(_.toString).toSeq === live.map(_.toString).toSeq,
        "retraining reproduces the deterministic k-means results")
    } finally {
      def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
      rm(new java.io.File(Similarity.ivfIndexPath(dir)))
      rm(new java.io.File(Similarity.ivfPostingsPath(dir)))
      Similarity.invalidateIvf(spark, dir)
    }
  }

  test("persisted RESIDUAL composed index: cold-session zero-training, kind isolation") {
    val live = Similarity.ivfPqResidualTopK(spark, dir).collect()
    val rawLive = Similarity.ivfPqTopK(spark, dir).collect()
    val pqLive = Similarity.pqTopK(spark, dir).collect()
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
    try {
      Similarity.buildIvfPqIndex(spark, dir, residual = true)
      val km = Similarity.kmeansRuns.get()
      val pq = Similarity.pqTrainRuns.get()
      val s2 = spark.newSession()
      val cold = Similarity.ivfPqResidualTopK(s2, dir).collect()
      assert(cold.map(_.toString).toSeq === live.map(_.toString).toSeq,
        "persisted residual index must reproduce in-session results bit-for-bit")
      assert(Similarity.kmeansRuns.get() === km, "cold residual probe must not train the quantizer")
      assert(Similarity.pqTrainRuns.get() === pq, "cold residual probe must not train codebooks")
      // kind isolation: the residual-kind codebook file must NOT be
      // scored as raw — the raw composed path and plain PQ retrain
      // in-session and still reproduce their own results
      val s3 = spark.newSession()
      assert(Similarity.ivfPqTopK(s3, dir).collect().map(_.toString).toSeq
        === rawLive.map(_.toString).toSeq,
        "raw composed path must not consume residual-coded postings")
      assert(Similarity.pqTopK(s3, dir).collect().map(_.toString).toSeq
        === pqLive.map(_.toString).toSeq,
        "plain PQ must not consume residual codebooks")
    } finally {
      Seq(Similarity.ivfIndexPath(dir), Similarity.pqIndexPath(dir),
        Similarity.ivfPqPostingsPath(dir)).foreach(p => rm(new java.io.File(p)))
      Similarity.invalidateIvf(spark, dir)
      Similarity.invalidatePq(spark, dir)
    }
  }

  test("rebuilding one index layout never leaves a sibling layout's stale data validated") {
    // the three layouts share two commit markers (centroids, codebooks)
    // but have disjoint data files — a build that rewrites a marker must
    // take down any sibling data that marker would otherwise validate,
    // or a seedBits/corpus change could serve stale assignments
    val live = Similarity.ivfTopK(spark, dir).collect()
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
    try {
      Similarity.buildIvfIndex(spark, dir)
      assert(new java.io.File(Similarity.ivfPostingsPath(dir)).exists())
      Similarity.buildIvfPqIndex(spark, dir) // rewrites BOTH markers
      assert(!new java.io.File(Similarity.ivfPostingsPath(dir)).exists(),
        "stale plain-IVF postings must not survive under the fresh centroid marker")
      assert(!new java.io.File(Similarity.pqCodesPath(dir)).exists(),
        "stale PQ codes must not survive under the fresh codebook marker")
      // the plain-IVF query falls back to the computed path against the
      // fresh persisted quantizer — same deterministic values, no stale read
      val s2 = spark.newSession()
      assert(Similarity.ivfTopK(s2, dir).collect().map(_.toString).toSeq
        === live.map(_.toString).toSeq)
      assert(new java.io.File(Similarity.ivfPqPostingsPath(dir)).exists())
      Similarity.buildPqIndex(spark, dir) // rewrites the codebook marker
      assert(!new java.io.File(Similarity.ivfPqPostingsPath(dir)).exists(),
        "stale composed postings must not survive under a fresh codebook marker")
    } finally {
      Seq(Similarity.ivfIndexPath(dir), Similarity.ivfPostingsPath(dir),
        Similarity.pqIndexPath(dir), Similarity.pqCodesPath(dir),
        Similarity.ivfPqPostingsPath(dir)).foreach(p => rm(new java.io.File(p)))
      Similarity.invalidateIvf(spark, dir)
      Similarity.invalidatePq(spark, dir)
    }
  }

  test("fingerprints agree exactly for identical docs") {
    val fps = TextAnalysis.fingerprints(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(fps(2L) === fps(3L))
    assert(fps(0L) !== fps(1L))
  }

  test("curation pipeline drops short docs and duplicate copies") {
    val kept = CurationPipeline.filteredCorpus(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(!kept.contains(4L), "4-char doc must fail the length gate")
    assert(!kept.contains(3L), "duplicate copy must lose to keep_id 2")
  }

  test("multimodal decode stub is deterministic and batch-shaped") {
    val feats = Multimodal.extractFeatures(spark, dir).collect()
    assert(feats.length === 5)
    val f23 = feats.filter(r => r.getAs[Long]("doc_id") >= 2 && r.getAs[Long]("doc_id") <= 3)
    assert(f23(0).getAs[String]("media_md5") === f23(1).getAs[String]("media_md5"))
    assert(feats.forall(r => r.getAs[Long]("width") < 1280 && r.getAs[Long]("height") < 720))
  }

  test("incremental dedup: batch-internal and vs-history dedup compose") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emptyIndex = Seq.empty[String].toDF("fp")
    val (s1, idx1) = CurationPipeline.incrementalDedup(docs, emptyIndex)
    assert(s1.count() === 4, "first batch: exact pair collapses to keeper")
    assert(idx1.count() === 4)
    // replaying the same batch against the updated index yields nothing
    val (s2, idx2) = CurationPipeline.incrementalDedup(docs, idx1)
    assert(s2.count() === 0, "already-indexed content must not survive")
    assert(idx2.count() === 4)
  }

  test("incremental dedup index update is append-only: no reshuffle of history") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Union}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val index = Seq("not-a-real-fp").toDF("fp")
    val (survivors, updated) = CurationPipeline.incrementalDedup(docs, index)
    val plan = updated.queryExecution.optimizedPlan
    assert(plan.isInstanceOf[Union], s"index update must be a plain union, got:\n$plan")
    val historySide = plan.asInstanceOf[Union].children.head
    assert(historySide.collect { case a: Aggregate => a }.isEmpty
      && historySide.collect { case d: Deduplicate => d }.isEmpty,
      s"history side of the index union must be untouched, got:\n$historySide")
    // appended fps are exactly the survivors' (already-unique, anti-joined) fps
    assert(updated.count() === index.count() + survivors.count())
    assert(updated.distinct().count() === updated.count())
  }

  test("incremental near-dup: one-word edits are caught within batch and across runs") {
    import spark.implicits._
    val base = (1 to 25).map(i => s"tok$i").mkString(" ")
    def edited(at: Int, repl: String): String =
      (1 to 25).map(i => if (i == at) repl else s"tok$i").mkString(" ")
    val emptyBands = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("band_key", org.apache.spark.sql.types.StringType))))
    val emptySigs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sig",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))))

    // run 1: base + an in-batch one-word edit (bigger id loses) + a fresh doc
    val fresh = (1 to 25).map(i => s"other$i").mkString(" ")
    val run1 = Seq((10L, base), (11L, edited(7, "changed")), (12L, fresh)).toDF("doc_id", "text")
    val (s1, sigs1) = CurationPipeline.incrementalNearDedup(run1, emptyBands, emptySigs)
    assert(s1.select("doc_id").as[Long].collect().sorted === Array(10L, 12L),
      "the within-batch near-dup (11 ~ 10) must drop; min id and the fresh doc survive")

    // the indexes a caller persists: survivors' sigs + bands
    val sigIdx = sigs1
    val bandIdx = TextDedup.bandsOf(sigs1)
    assert(sigIdx.count() === 2 && bandIdx.count() === 16, "8 band rows + 1 sig row per survivor")

    // run 2: near-dup of run 1 (different edit), an exact re-send with a
    // DIFFERENT id, and a genuinely new doc
    val brandNew = (1 to 25).map(i => s"novel$i").mkString(" ")
    val run2 = Seq((20L, edited(3, "tweaked")), (21L, fresh), (22L, brandNew)).toDF("doc_id", "text")
    val (s2, _) = CurationPipeline.incrementalNearDedup(run2, bandIdx, sigIdx)
    assert(s2.select("doc_id").as[Long].collect().sorted === Array(22L),
      "cross-run near-dup (20 ~ indexed 10) and re-send (21 = indexed 12) must drop")

    // replay safety: a batch whose own rows ARE already indexed (crash
    // after index write, before offset commit) reproduces its survivors
    val replayBands = bandIdx.unionByName(TextDedup.bandsOf(sigs1)) // self rows present
    val (s1b, _) = CurationPipeline.incrementalNearDedup(run1, replayBands, sigIdx)
    assert(s1b.select("doc_id").as[Long].collect().sorted === Array(10L, 12L),
      "same-doc_id index hits must not delete the replayed batch")
  }

  test("decontamination flags training docs that near-dup the benchmark") {
    import spark.implicits._
    val base = (1 to 25).map(i => s"tok$i").mkString(" ")
    val leaked = (1 to 25).map(i => if (i == 7) "changed" else s"tok$i").mkString(" ")
    val clean = (1 to 25).map(i => s"other$i").mkString(" ")
    val corpus = Seq((100L, leaked), (101L, clean)).toDF("doc_id", "text")
    val bench = Seq((1L, base)).toDF("doc_id", "text")
    val flagged = TextDedup.crossCorpusNearDups(corpus, bench).collect()
    assert(flagged.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((100L, 1L)),
      "the one-word edit of a benchmark doc must be flagged; the clean doc must not")
    assert(flagged(0).getAs[Double]("est_jaccard") >= 0.2)
  }

  test("incremental phash dedup: within-batch, cross-run, replay-safe, through the real decode path") {
    import spark.implicits._
    def png(seed: Int, editCell: Int = -1): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (cell <- 0 until 64) {
        var v = (seed * 37 + cell * 11) % 256
        if (cell == editCell) v = (v + 64) % 256
        img.setRGB(cell % 8, cell / 8, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    // the WIDE index shape (round 14): doc_id, 4 limbs, band ordinal, band key
    val emptyIdx = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("h0", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("h1", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("h2", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("h3", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("bb", org.apache.spark.sql.types.LongType))))

    // run 1: base image + an in-batch one-cell edit of it (bigger id
    // loses) + an unrelated image — texts all DIFFER, so only the
    // media gate can see the duplication
    val run1 = Seq(
      (10L, "first unique text", png(5)),
      (11L, "second unique text", png(5, editCell = 0)),
      (12L, "third unique text", png(9))).toDF("doc_id", "text", "media")
    val (s1, bands1) = CurationPipeline.incrementalPhashDedup(run1, emptyIdx)
    assert(s1.select("doc_id").as[Long].collect().sorted === Array(10L, 12L),
      "the within-batch phash near-dup (11 ~ 10) must drop; min id and the unrelated image survive")
    val idx1 = bands1.select("doc_id", "h0", "h1", "h2", "h3", "i", "bb")
    assert(idx1.count() === 14, "7 band rows per survivor")

    // run 2: a RE-ENCODED copy of run 1's image (identical pixels,
    // different bytes — both text gates would pass it), plus a new image
    val run2 = Seq(
      (20L, "fourth unique text", png(5) :+ 0x00.toByte),
      (21L, "fifth unique text", png(77))).toDF("doc_id", "text", "media")
    val (s2, _) = CurationPipeline.incrementalPhashDedup(run2, idx1)
    assert(s2.select("doc_id").as[Long].collect().sorted === Array(21L),
      "the cross-run re-encoded copy (20 ~ indexed 10) must drop through the decode path")

    // replay safety: the batch's own rows already indexed (crash after
    // index write) must not delete the replayed batch
    val (s1b, _) = CurationPipeline.incrementalPhashDedup(run1, idx1)
    assert(s1b.select("doc_id").as[Long].collect().sorted === Array(10L, 12L))

    // docs with NULL media pass un-indexed instead of throwing
    val nullMedia = Seq((30L, "text only doc", null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "text", "media")
    val (s3, b3) = CurationPipeline.incrementalPhashDedup(nullMedia, idx1)
    assert(s3.count() === 1 && b3.count() === 7,
      "null media falls back to text bytes (the fixture stand-in)")
  }

  test("a legacy 60-bit phash index fails loudly, not silently-empty") {
    // readBatchIndex reads with an explicit schema, so a legacy
    // (doc_id, phash, i, bb) index under the wide gate would fill
    // h0..h3 with nulls and quietly stop matching ALL history — the
    // width is part of the index contract and must throw instead.
    import spark.implicits._
    val pd = Files.createTempDirectory("legacy_ph").toString + "/bands"
    Seq((1L, 42L, 0, 7L)).toDF("doc_id", "phash", "i", "bb")
      .withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(pd)
    val batch = Seq((2L, "some doc text")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      CurationPipeline.processMediaBatch(
        batch, 1L, pd + "_corpus", pd, maxHamming = 6)
    }
    assert(e.getMessage.contains("240-bit"),
      s"error must name the expected format: ${e.getMessage}")
  }

  test("media gate replay == greedy filter from the batch wide face's pairs") {
    // The round-14 gate/batch equivalence (the text gate's
    // dedup_minhash_est pattern): the batch wide face enumerates ALL
    // pairs at 240-bit hamming <= 6 (limb banding is lossless there by
    // pigeonhole, MultimodalSpec), so a driver-side greedy replay of
    // the gate's two rules over that pair set must reproduce the
    // streaming gate's survivors exactly — if the gate's banded
    // candidate join missed a pair the batch face sees, the outputs
    // diverge here.
    val sfDir = "/root/testdata/sf0.001"
    val pairs = Multimodal.phashNearDupWide(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbr = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val corpusIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val plantedIds = (0 until Multimodal.PlantedGroups * 3)
      .map(g => Multimodal.PlantedBase + g.toLong)
    val all = (corpusIds ++ plantedIds).sorted
    // greedy unroll of the gate's rules: batches by pmod(doc_id, 3) in
    // order; in-batch = near-dup of ANY smaller-id batch doc (survivor
    // or not) drops; cross-batch = near-dup of any prior SURVIVOR drops
    val survivorIdx = scala.collection.mutable.Set[Long]()
    val expected = scala.collection.mutable.Map[Long, Long]()
    for (b <- 0 to 2) {
      val batch = all.filter(id => math.floorMod(id, 3) == b)
      val kept = batch.filter { id =>
        val nb = nbr.getOrElse(id, Set.empty)
        !nb.exists(n => math.floorMod(n, 3) == b.toLong && n < id) &&
          !nb.exists(survivorIdx)
      }
      kept.foreach { id => expected(id) = b.toLong }
      survivorIdx ++= kept
    }
    val got = CurationPipeline.mediaCurationReplay(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected.toMap,
      "streaming media gate must equal the batch wide face's greedy unroll")
  }

  test("a JSONL corpus flows through the dedup operators unchanged") {
    val d = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(d, "docs.jsonl")
    Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog", "lang": "en"}
        |{"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog", "lang": "en"}
        |{"doc_id": 3, "text": "completely different content here entirely", "lang": "en"}
        |{"text": "row without an id gets a stable content hash"}""".stripMargin)
    val docs = graft.sources.DocSources.jsonl(spark, f.getAbsolutePath)
    assert(docs.count() === 4)
    // missing doc_id -> negative stable id, no collision with real ids
    val synth = docs.filter(col("doc_id") < 0).collect()
    assert(synth.length === 1)
    // the operator layer is source-agnostic: exact-dup pair found
    val pairs = TextHashing.jaccardPairs(docs, 0.9).collect()
    assert(pairs.length === 1)
    assert((pairs(0).getLong(0), pairs(0).getLong(1)) === (1L, 2L))
    assert(pairs(0).getAs[Double]("jaccard") === 1.0)
  }

  test("streaming dedup: cross-batch duplicates never reach the corpus") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Files.createTempDirectory("curcorpus").toString + "/docs"
    val index = Files.createTempDirectory("curindex").toString + "/fp"
    val ckpt = Files.createTempDirectory("curckpt").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CurationPipeline.streamingDedup(
      stream.toDS().toDF("doc_id", "text"), corpus, index, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))

    // batch 1: A, B, and an in-batch duplicate of A
    stream.addData((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha doc"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate of B (different doc_id) + new C
    stream.addData((4L, "beta doc"), (5L, "gamma doc"))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(corpus).collect()
    assert(out.map(_.getAs[String]("text")).sorted.toSeq ===
      Seq("alpha doc", "beta doc", "gamma doc"), "one survivor per distinct text")
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 2L, 5L),
      "min doc_id wins in-batch; cross-batch dup dropped by the index")
    assert(spark.read.parquet(index).count() === 3)
  }

  test("NULL text never survives streaming curation: dropped by the exact gate, never indexed") {
    // the documented degenerate-text contract (incrementalNearDedup's
    // scaladoc), proven END TO END through streamingDedup with both
    // gates on: a null-text doc (a decode failure upstream) produces no
    // signature and a null fingerprint, so it must be dropped by policy
    // — not silently curated, not indexed anywhere
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory("curnull").toString
    val (corpus, index, nd, ckpt) =
      (s"$base/docs", s"$base/fp", s"$base/nd", s"$base/ckpt")
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Option[String])]
    val q = CurationPipeline.streamingDedup(
      stream.toDS().toDF("doc_id", "text"), corpus, index, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      nearDupDir = Some(nd))
    stream.addData((1L, Some("alpha doc body with words")), (2L, None))
    q.processAllAvailable()
    stream.addData((3L, None), (4L, Some("entirely unrelated second text about other things")))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 4L), "null-text docs must never reach the curated corpus")
    val fps = spark.read.parquet(index).collect()
    assert(fps.length === 2 && fps.forall(!_.isNullAt(0)),
      "the fp index holds the two real docs and no null fingerprint")
    assert(spark.read.parquet(s"$nd/sigs").select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 4L), "no signature rows for null-text docs")
  }

  test("sink compaction merges cold batches; hot-batch replay stays idempotent") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Files.createTempDirectory("cmpcorpus").toString + "/docs"
    val index = Files.createTempDirectory("cmpindex").toString + "/fp"
    val ckpt = Files.createTempDirectory("cmpckpt").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CurationPipeline.streamingDedup(
      stream.toDS().toDF("doc_id", "text"), corpus, index, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    stream.addData((1L, "alpha doc"), (2L, "beta doc")); q.processAllAvailable()
    stream.addData((3L, "gamma doc")); q.processAllAvailable()
    stream.addData((4L, "delta doc"), (5L, "alpha doc")); q.processAllAvailable()
    q.stop()

    def batchDirs(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(batchDirs(index) === 3)
    CurationPipeline.compactSink(spark, index, keepRecent = 1)
    CurationPipeline.compactSink(spark, corpus, keepRecent = 1)
    assert(batchDirs(index) === 2, "cold index batches merged, hot kept")
    assert(batchDirs(corpus) === 2, "cold corpus batches merged, hot kept")
    assert(spark.read.parquet(index).count() === 4, "index content unchanged")
    assert(spark.read.parquet(corpus).select("text").as[String].collect().sorted.toSeq
      === Seq("alpha doc", "beta doc", "delta doc", "gamma doc"))

    // replay the HOT batch — the only one a checkpointed stream can ever
    // replay — exactly as the sink would: dynamic overwrite of its own
    // partition must replace, not append
    Seq((4L, "delta doc")).toDF("doc_id", "text")
      .withColumn("batch_id", lit(2L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(corpus)
    assert(spark.read.parquet(corpus).count() === 4, "no duplication after replay")
    assert(spark.read.parquet(corpus).select("text").distinct().count() === 4)
  }

  test("streaming vector dedup: colinear embeddings never reach the sink across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Files.createTempDirectory("vdcorpus").toString + "/vecs"
    val index = Files.createTempDirectory("vdindex").toString + "/idx"
    val ckpt = Files.createTempDirectory("vdckpt").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val q = CurationPipeline.streamingVectorDedup(
      stream.toDS().toDF("vec_id", "embedding"), corpus, index, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    val base = (1 to 64).map(i => math.sin(i.toDouble).toFloat).toArray
    val other = (1 to 64).map(i => math.cos(i * 3.0).toFloat).toArray
    try {
      // batch 0: base + an in-batch colinear copy (bigger id loses)
      stream.addData((1L, base), (2L, base.map(_ * 2.0f)))
      q.processAllAvailable()
      // batch 1: cross-batch colinear copy of 1 + a genuinely new vector
      stream.addData((3L, base.map(_ * 0.5f)), (4L, other))
      q.processAllAvailable()
      val out = spark.read.parquet(corpus).select("vec_id").as[Long].collect().sorted
      assert(out === Array(1L, 4L),
        "in-batch and cross-batch colinear vectors must be dropped by the persisted index")
      assert(spark.read.parquet(index).count() === 2, "one index row per survivor")
    } finally q.stop()
  }

  test("replayed batch sees the index AS OF its first attempt (crashed fp write recovered)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Files.createTempDirectory("rhcorpus").toString + "/docs"
    val index = Files.createTempDirectory("rhindex").toString + "/fp"
    val near = Files.createTempDirectory("rhnear").toString + "/nd"
    val ckpt = Files.createTempDirectory("rhckpt").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CurationPipeline.streamingDedup(
      stream.toDS().toDF("doc_id", "text"), corpus, index, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      nearDupDir = Some(near))
    def words(tag: String) = (1 to 25).map(i => s"$tag$i").mkString(" ")
    try {
      stream.addData((1L, words("aa"))); q.processAllAvailable() // batch 0
      // simulate batch 1's CRASHED first attempt: its fp-index partition
      // was written, the bands/sigs writes and the offset commit were not
      val doomed = words("bb")
      Seq(doomed).toDF("text")
        .select(org.apache.spark.sql.functions.md5(lower(col("text"))).as("fp"))
        .withColumn("batch_id", lit(1L))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(index)
      // the replay: the SAME doc arrives as batch 1 — it must NOT be
      // anti-joined away by its own crashed fp rows
      stream.addData((2L, doomed)); q.processAllAvailable()
      val out = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(out === Array(1L, 2L),
        "the replayed batch must survive its own crashed index partition")
      assert(spark.read.parquet(s"$near/bands").filter("doc_id = 2").count() === 8L,
        "the near-dup index must gain the replayed batch's band rows")
      assert(spark.read.parquet(s"$near/sigs").filter("doc_id = 2").count() === 1L)
    } finally q.stop()
  }

  test("near-dup index dirs compact in-pipeline and the gate keeps working after") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Files.createTempDirectory("ndccorpus").toString + "/docs"
    val index = Files.createTempDirectory("ndcindex").toString + "/fp"
    val near = Files.createTempDirectory("ndcnear").toString + "/nd"
    val ckpt = Files.createTempDirectory("ndcckpt").toString
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CurationPipeline.streamingDedup(
      stream.toDS().toDF("doc_id", "text"), corpus, index, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      compactEvery = 2, nearDupDir = Some(near))
    def words(tag: String) = (1 to 25).map(i => s"$tag$i").mkString(" ")
    def edited(tag: String, at: Int) =
      (1 to 25).map(i => if (i == at) "edited" else s"$tag$i").mkString(" ")
    try {
      stream.addData((1L, words("aa"))); q.processAllAvailable()           // batch 0
      stream.addData((2L, words("bb"))); q.processAllAvailable()           // batch 1
      stream.addData((3L, words("cc"))); q.processAllAvailable()           // batch 2 -> compaction
      // batches 0-1 collapsed into a negative-id partition; batch 2 kept
      def batchDirs(d: String) = new java.io.File(d).listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      for (d <- Seq(s"$near/bands", s"$near/sigs")) {
        val dirs = batchDirs(d)
        assert(dirs.exists(_.stripPrefix("batch_id=").toLong < 0),
          s"$d must have a merged cold partition (saw $dirs)")
        assert(dirs.size <= 2, s"$d partitions must stay bounded (saw $dirs)")
      }
      assert(spark.read.parquet(s"$near/sigs").count() === 3, "compaction keeps content")
      // the gate still catches near-dups of COMPACTED history
      stream.addData((4L, edited("aa", 5)), (5L, words("dd")))             // batch 3
      q.processAllAvailable()
      val out = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(out === Array(1L, 2L, 3L, 5L),
        "the near-dup of compacted doc 1 must be dropped, the fresh doc kept")
    } finally q.stop()
  }

  test("prefix-filtered jaccard: exact values, recall limited to rare-shingle pairs") {
    val full = TextDedup.ngramJaccard(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    // generous cap: identical result
    val loose = TextHashing.jaccardPairsPrefixFiltered(
        spark.read.parquet(s"$dir/documents.parquet"), 0.2, maxShingleDf = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(loose === full)
    // every surviving pair under a tight cap keeps its EXACT jaccard
    val tight = TextHashing.jaccardPairsPrefixFiltered(
        spark.read.parquet(s"$dir/documents.parquet"), 0.2, maxShingleDf = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard")))
    tight.foreach { case (k, j) => assert(full(k) === j, s"value drifted for $k") }
  }

  test("PPJoin filters are lossless: filtered pair set == unfiltered, values exact") {
    // real-corpus scale check: sf0.001's 500 docs, several thresholds —
    // the filters must drop NOTHING at any threshold, including pairs
    // sitting exactly on a prefix-length or overlap boundary
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (t <- Seq(0.2, 0.5, 0.9)) {
      val full = TextHashing.jaccardPairs(corpus, t).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
      val pp = TextHashing.jaccardPairsPPJoin(corpus, t).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
      assert(pp === full, s"PPJoin must be lossless at t=$t")
    }
    // boundary fixture: identical docs (J=1.0) and a pair at exactly the
    // threshold — 3-word docs sharing their single whole-text shingle
    // have J=1; docs 5/6 share 1 of 2 shingles each (J = 1/3 >= 1/3)
    import spark.implicits._
    val crafted = Seq(
      (1L, "a b c"), (2L, "a b c"),
      (5L, "p q r s"), (6L, "p q r t")).toDF("doc_id", "text")
    val t = 1.0 / 3.0
    val full = TextHashing.jaccardPairs(crafted, t).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    val pp = TextHashing.jaccardPairsPPJoin(crafted, t).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(full.contains((5L, 6L)), "fixture must include an at-threshold pair")
    assert(pp === full, "boundary pairs must survive the epsilon-guarded filters")
  }

  test("DedupIndex: persisted index serves identical results and reuses cache") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idx = DedupIndex(docs)
    try {
      val viaIndex = idx.ngramPairs().orderBy("doc_a", "doc_b").collect().toSeq
      val direct = TextDedup.ngramJaccard(spark, dir).collect().toSeq
      assert(viaIndex.map(_.toSeq) === direct.map(_.toSeq))
      assert(idx.shingles.storageLevel.useMemory || idx.shingles.storageLevel.useDisk,
        "index must be persisted")
      import spark.implicits._
      val cands = Seq((2L, 3L)).toDF("doc_a", "doc_b")
      val verified = idx.verifyPairs(cands).collect()
      assert(verified.length === 1 && verified(0).getAs[Double]("jaccard") === 1.0)
    } finally idx.close()
  }

  // ---- round 9: large-k quantizer, dense components, calibrationDir ----

  test("centroid assignment: broadcast-join path ≡ literal path, NaN rule included") {
    import spark.implicits._
    val d = Files.createTempDirectory("assigneq").toString
    // a zero vector makes every cosine NaN — both paths must park it in
    // the smallest-id cluster, not throw or diverge
    val zero = Seq((9999L, Array.fill(64)(0.0f), 0)).toDF("vec_id", "embedding", "label")
    graft.tools.SyntheticEmbeddings.write(spark, d,
      graft.tools.SyntheticEmbeddings.uniform(spark, 400).unionByName(zero))
    val e = Similarity.emb(spark, d)
    val cents = e.filter(col("vec_id") < 24).select("vec_id", "v").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    val viaLit = e.withColumn("c_id", Similarity.assignCol(cents))
      .select("vec_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val viaJoin = Similarity.assignViaJoin(e, cents.toDF("c_id", "cv"))
      .select("vec_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(viaJoin === viaLit, "join-path assignment must equal the literal path row for row")
    assert(viaLit.find(_._1 == 9999L).get._2 === cents.map(_._1).min,
      "the NaN (zero-vector) rule must hold on both paths")
  }

  test("large-k composed index (seedBits=10): join-path build, exact full probe, pruned cold probe") {
    val d = Files.createTempDirectory("bigk").toString
    graft.tools.SyntheticEmbeddings.write(spark, d,
      graft.tools.SyntheticEmbeddings.uniform(spark, 2000))
    try {
      Similarity.buildIvfPqIndex(spark, d, seedBits = 10)
      val kClusters = spark.read.parquet(Similarity.ivfIndexPath(d)).count().toInt
      assert(kClusters > Similarity.MaxLiteralK,
        s"fixture must exercise the join path, got k=$kClusters")
      val qids = (0L until 8L).toSeq
      val truth = Similarity.bruteForceTopKFor(spark, d, qids, 5).collect()
      // probing every cluster with an unbounded shortlist IS brute force
      // — proves the large-k index end-to-end exact, not just plausible
      val all = Similarity.ivfPqTopKFor(spark, d, qids, 5,
        nprobe = kClusters, shortlist = 2000).collect()
      assert(all.map(_.toString).toSeq === truth.map(_.toString).toSeq)
      // pruned cold probe: zero training, c_id partition filter, and no
      // literal lookup map in the plan (the k-scaled typedLits are gone)
      val km = Similarity.kmeansRuns.get()
      val pq = Similarity.pqTrainRuns.get()
      val s2 = spark.newSession()
      val probed = Similarity.ivfPqTopKFor(s2, d, qids, 5, nprobe = 4, shortlist = 40)
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("partitionfilters: [c_id"),
        "large-k probe must stay statically partition-pruned")
      assert(probed.collect().nonEmpty)
      assert(Similarity.kmeansRuns.get() === km && Similarity.pqTrainRuns.get() === pq,
        "cold large-k probe must not train either quantizer")
      // the RESIDUAL layout at large k: same exactness bar
      Similarity.buildIvfPqIndex(spark, d, seedBits = 10, residual = true)
      val allRes = Similarity.ivfPqResidualTopKFor(spark, d, qids, 5,
        nprobe = kClusters, shortlist = 2000).collect()
      assert(allRes.map(_.toString).toSeq === truth.map(_.toString).toSeq)
      val resPlan = Similarity.ivfPqResidualTopKFor(spark, d, qids, 5,
        nprobe = 4, shortlist = 40).queryExecution.executedPlan.toString
      assert(!resPlan.contains("keys: ["),
        "residual probe must not carry k-scaled literal lookup maps")
    } finally {
      Similarity.invalidateIvf(spark, d)
      Similarity.invalidatePq(spark, d)
    }
  }

  test("clustered corpus: residual codes beat raw-PQ codes by a real recall margin") {
    // the fixture corpora are near-uniform — quantization's worst case,
    // where the residual gain measured ~0.02. Real embedding corpora
    // cluster; on blobs the coarse quantizer absorbs the blob offset
    // and the codebooks spend all 32 bits on in-blob detail, while
    // raw-vector codes waste them re-describing the blob centers.
    val d = Files.createTempDirectory("blobs").toString
    graft.tools.SyntheticEmbeddings.write(spark, d,
      graft.tools.SyntheticEmbeddings.clustered(spark, 2000, nBlobs = 16, sigma = 0.2))
    try {
      val qids = (0L until 32L).toSeq
      val truth = Similarity.bruteForceTopKFor(spark, d, qids, 5)
      truth.persist().count()
      val raw = Similarity.recallAtK(
        Similarity.ivfPqTopKFor(spark, d, qids, 5, nprobe = 2, shortlist = 40), truth)
      val res = Similarity.recallAtK(
        Similarity.ivfPqResidualTopKFor(spark, d, qids, 5, nprobe = 2, shortlist = 40), truth)
      truth.unpersist()
      assert(res >= raw + 0.1,
        f"residual must clearly beat raw PQ on clustered data: raw=$raw%.3f res=$res%.3f")
      assert(res >= 0.5, f"residual recall on blobs regressed: $res%.3f")
    } finally {
      Similarity.invalidateIvf(spark, d)
      Similarity.invalidatePq(spark, d)
    }
  }

  test("a mixed-kind codebooks file is corrupt: retrain in-session, never guess the algebra") {
    val live = Similarity.pqTopK(spark, dir).collect()
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
    try {
      Similarity.buildPqIndex(spark, dir)
      val rows = spark.read.parquet(Similarity.pqIndexPath(dir)).collect()
      val schema = spark.read.parquet(Similarity.pqIndexPath(dir)).schema
      val kindAt = schema.fieldIndex("kind")
      val mixed = rows ++ rows.take(1).map { r =>
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq.updated(kindAt, "residual"))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(mixed.toIndexedSeq), schema)
        .coalesce(1).write.mode("overwrite").parquet(Similarity.pqIndexPath(dir))
      Similarity.invalidatePq(spark, dir)
      val before = Similarity.pqTrainRuns.get()
      val s2 = spark.newSession()
      assert(Similarity.pqTopK(s2, dir).collect().map(_.toString).toSeq
        === live.map(_.toString).toSeq,
        "a mixed-kind file must fall back to deterministic retraining, values unchanged")
      assert(Similarity.pqTrainRuns.get() === before + 1,
        "mixed kinds must trigger in-session retraining, not a guessed read")
    } finally {
      Seq(Similarity.pqIndexPath(dir), Similarity.pqCodesPath(dir),
        Similarity.ivfPqPostingsPath(dir)).foreach(p => rm(new java.io.File(p)))
      Similarity.invalidatePq(spark, dir)
    }
  }

  test("buildPqIndex over a residual index drops residual session state too") {
    val resLive = Similarity.ivfPqResidualTopK(spark, dir).collect()
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
    try {
      Similarity.buildIvfPqIndex(spark, dir, residual = true)
      val s2 = spark.newSession()
      // warm s2's residual codebooks from the persisted residual file
      assert(Similarity.ivfPqResidualTopK(s2, dir).collect().map(_.toString).toSeq
        === resLive.map(_.toString).toSeq)
      // rewriting the SHARED backing file (pq_index.parquet) as RAW must
      // invalidate s2's residual codebooks + postings: the next residual
      // probe retrains rather than serving state tied to a dead file
      Similarity.buildPqIndex(s2, dir)
      val before = Similarity.pqTrainRuns.get()
      assert(Similarity.ivfPqResidualTopK(s2, dir).collect().map(_.toString).toSeq
        === resLive.map(_.toString).toSeq)
      assert(Similarity.pqTrainRuns.get() === before + 1,
        "stale residual codebooks must not survive a raw rebuild of their backing file")
    } finally {
      Seq(Similarity.ivfIndexPath(dir), Similarity.pqIndexPath(dir),
        Similarity.pqCodesPath(dir), Similarity.ivfPqPostingsPath(dir))
        .foreach(p => rm(new java.io.File(p)))
      Similarity.invalidateIvf(spark, dir)
      Similarity.invalidatePq(spark, dir)
    }
  }

  test("string components survive id-hash collisions via the dense-dictionary path") {
    import spark.implicits._
    val nodes = Seq("x1", "x2", "x3", "x4").toDF("id")
    val edges = Seq(("x1", "x3"), ("x2", "x4")).toDF("a", "b")
    val expect = Map("x1" -> "x1", "x3" -> "x1", "x2" -> "x2", "x4" -> "x2")
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // a DELIBERATELY colliding hash: x2 hashes to x1's value — the naive
    // hashed contraction would merge all four ids into one component
    val collide: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => when(c === "x2", TextHashing.md5Long(lit("x1"))).otherwise(TextHashing.md5Long(c))
    assert(labelsOf(GraphOps.connectedComponentsByStringHashed(nodes, edges, collide)) === expect,
      "the collision check must reroute to the dense path, never mislabel")
    // the dense face directly, and agreement with the hashed face on
    // collision-free input
    assert(labelsOf(GraphOps.connectedComponentsByStringDense(nodes, edges)) === expect)
    assert(labelsOf(GraphOps.connectedComponentsByString(nodes, edges)) === expect)
  }

  test("composed-index delta append: probe-all exact over base+appends, idempotent retry, rebuild drops delta") {
    val all = Files.createTempDirectory("annappendall").toString // full corpus: the truth side
    val idx = Files.createTempDirectory("annappendidx").toString // indexed: base half + appends
    def corpus = graft.tools.SyntheticEmbeddings.uniform(spark, 1200)
    graft.tools.SyntheticEmbeddings.write(spark, all, corpus)
    graft.tools.SyntheticEmbeddings.write(spark, idx, corpus.filter(col("vec_id") < 600))
    val qids = (0L until 8L).toSeq
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
        .collect().map(_.toString).toSeq
    try {
      Similarity.buildIvfPqIndex(spark, idx)
      val kClusters = spark.read.parquet(Similarity.ivfIndexPath(idx)).count().toInt
      // appends arrive as (vec_id, embedding) batches — new vectors the
      // base build never saw, coded under the PERSISTED quantizers
      val b1 = corpus.filter(col("vec_id") >= 600 && col("vec_id") < 900)
      val b2 = corpus.filter(col("vec_id") >= 900)
      val km = Similarity.kmeansRuns.get(); val pq = Similarity.pqTrainRuns.get()
      Similarity.appendToIvfPqIndex(spark, idx, b1, batchId = 1)
      Similarity.appendToIvfPqIndex(spark, idx, b2, batchId = 2)
      assert(Similarity.kmeansRuns.get() === km && Similarity.pqTrainRuns.get() === pq,
        "appends must never retrain a quantizer")
      // the index stays a PARTITIONING of base ∪ appends: probing every
      // cluster with an unbounded shortlist must equal brute force over
      // the FULL corpus — stale centroids cost recall, never correctness
      val truth = sorted(Similarity.bruteForceTopKFor(spark, all, qids, 5))
      assert(sorted(Similarity.ivfPqTopKFor(spark, idx, qids, 5,
        nprobe = kClusters, shortlist = 1200)) === truth)
      // a pruned probe in a COLD session serves appended rows without
      // training, and the c_id partition filter prunes BOTH scans
      val probed = Similarity.ivfPqTopKFor(spark.newSession(), idx, qids, 5,
        nprobe = 2, shortlist = 40)
      val plan = probed.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("partitionfilters: [c_id")
        || plan.contains("partitionfilters: [isnotnull(c_id"))
      assert(probed.collect().nonEmpty)
      assert(Similarity.kmeansRuns.get() === km && Similarity.pqTrainRuns.get() === pq)
      // crash-retry idempotence: re-running a batch id dynamic-overwrites
      // its own partitions — results identical, no duplicate rows
      Similarity.appendToIvfPqIndex(spark, idx, b2, batchId = 2)
      assert(sorted(Similarity.ivfPqTopKFor(spark, idx, qids, 5,
        nprobe = kClusters, shortlist = 1200)) === truth)
      // a REBUILD replaces the quantizers, so it must take the delta
      // (coded under the old ones) down with it
      Similarity.buildIvfPqIndex(spark, idx)
      assert(!new java.io.File(Similarity.ivfPqDeltaPath(idx)).exists(),
        "rebuild must delete delta postings coded under the replaced quantizers")
      // the RESIDUAL layout appends through the same path: reconstruction
      // algebra over appended codes stays exact
      Similarity.buildIvfPqIndex(spark, idx, residual = true)
      Similarity.appendToIvfPqIndex(spark, idx, b1, batchId = 1)
      Similarity.appendToIvfPqIndex(spark, idx, b2, batchId = 2)
      val kRes = spark.read.parquet(Similarity.ivfIndexPath(idx)).count().toInt
      assert(sorted(Similarity.ivfPqResidualTopKFor(spark, idx, qids, 5,
        nprobe = kRes, shortlist = 1200)) === truth)
    } finally {
      Seq(all, idx).foreach { d =>
        Similarity.invalidateIvf(spark, d); Similarity.invalidatePq(spark, d)
      }
    }
  }

  test("composed-index compaction folds delta into base: no retraining, exactness preserved") {
    val all = Files.createTempDirectory("anncompall").toString
    val idx = Files.createTempDirectory("anncompidx").toString
    def corpus = graft.tools.SyntheticEmbeddings.uniform(spark, 1000)
    graft.tools.SyntheticEmbeddings.write(spark, all, corpus)
    graft.tools.SyntheticEmbeddings.write(spark, idx, corpus.filter(col("vec_id") < 500))
    val qids = (0L until 8L).toSeq
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
        .collect().map(_.toString).toSeq
    try {
      Similarity.buildIvfPqIndex(spark, idx)
      val kClusters = spark.read.parquet(Similarity.ivfIndexPath(idx)).count().toInt
      Similarity.appendToIvfPqIndex(spark, idx,
        corpus.filter(col("vec_id") >= 500), batchId = 1)
      val truth = sorted(Similarity.bruteForceTopKFor(spark, all, qids, 5))
      assert(sorted(Similarity.ivfPqTopKFor(spark, idx, qids, 5,
        nprobe = kClusters, shortlist = 1000)) === truth)
      // compaction is a pure relayout: codes unchanged, NO training
      val km = Similarity.kmeansRuns.get(); val pq = Similarity.pqTrainRuns.get()
      Similarity.compactIvfPqIndex(spark, idx)
      assert(Similarity.kmeansRuns.get() === km && Similarity.pqTrainRuns.get() === pq,
        "compaction must not retrain either quantizer")
      assert(!new java.io.File(Similarity.ivfPqDeltaPath(idx)).exists(),
        "compaction must remove the delta it folded in")
      assert(!new java.io.File(s"${Similarity.ivfPqPostingsPath(idx)}.compacting").exists(),
        "staging dir must not outlive the swap")
      // same results from one base scan, cold session included
      assert(sorted(Similarity.ivfPqTopKFor(spark, idx, qids, 5,
        nprobe = kClusters, shortlist = 1000)) === truth)
      assert(sorted(Similarity.ivfPqTopKFor(spark.newSession(), idx, qids, 5,
        nprobe = kClusters, shortlist = 1000)) === truth)
      assert(Similarity.kmeansRuns.get() === km && Similarity.pqTrainRuns.get() === pq)
      // compacting with no delta is a no-op, and the compacted index
      // accepts fresh appends (the LSM loop keeps turning)
      Similarity.compactIvfPqIndex(spark, idx)
      Similarity.appendToIvfPqIndex(spark, idx,
        corpus.filter(col("vec_id") >= 900), batchId = 2)
      val again = Similarity.ivfPqTopKFor(spark, idx, qids, 5,
        nprobe = kClusters, shortlist = 1000)
      // vec_ids >= 900 now appear TWICE (base fold + re-append) — this
      // test only asserts the path stays serveable; id uniqueness is the
      // caller's contract (previous test pins the exact-result bar)
      assert(again.collect().nonEmpty)
    } finally {
      Seq(all, idx).foreach { d =>
        Similarity.invalidateIvf(spark, d); Similarity.invalidatePq(spark, d)
      }
    }
  }

  test("external query vectors: no self-exclusion, id-face agreement, pruned cold probe") {
    val d = Files.createTempDirectory("extq").toString
    graft.tools.SyntheticEmbeddings.write(spark, d,
      graft.tools.SyntheticEmbeddings.uniform(spark, 800))
    try {
      val e = Similarity.emb(spark, d)
      // external queries = copies of corpus vectors 3 and 7 under NEW
      // ids in the caller's namespace
      val ext = e.filter(col("vec_id").isin(3L, 7L))
        .select((col("vec_id") + 9000L).as("qid"),
          col("v").cast("array<float>").as("embedding"))
      def byQid(rows: Array[org.apache.spark.sql.Row]) =
        rows.groupBy(_.getLong(0)).view.mapValues(_.toSeq.map(r =>
          (r.getLong(1), r.getDouble(2)))).toMap
      val brute = byQid(Similarity.bruteForceTopKForVectors(spark, d, ext, 5).collect())
      // top-1 per query is the SOURCE row at cos 1.0 — external queries
      // must NOT self-exclude
      for ((qid, src) <- Seq(9003L -> 3L, 9007L -> 7L)) {
        assert(brute(qid).head === ((src, 1.0)),
          s"external query $qid must rank its indexed source $src first at cos 1.0")
      }
      // ranks 2..k agree with the self-excluding id face's ranks 1..k-1
      val idFace = byQid(Similarity.bruteForceTopKFor(spark, d, Seq(3L, 7L), 4).collect())
      assert(brute(9003L).tail === idFace(3L) && brute(9007L).tail === idFace(7L),
        "beyond the self row, external and id faces must rank identically")
      // the composed probe serves external vectors from the persisted
      // index: probe-all == external brute force; a pruned COLD probe
      // stays partition-pruned and training-free
      Similarity.buildIvfPqIndex(spark, d)
      val kC = spark.read.parquet(Similarity.ivfIndexPath(d)).count().toInt
      assert(byQid(Similarity.ivfPqTopKForVectors(spark, d, ext, 5,
        nprobe = kC, shortlist = 800).collect()) === brute)
      val km = Similarity.kmeansRuns.get(); val pq = Similarity.pqTrainRuns.get()
      val probed = Similarity.ivfPqTopKForVectors(spark.newSession(), d, ext, 5,
        nprobe = 2, shortlist = 20)
      assert(probed.queryExecution.executedPlan.toString.toLowerCase
        .contains("partitionfilters: [c_id"))
      assert(probed.collect().nonEmpty)
      assert(Similarity.kmeansRuns.get() === km && Similarity.pqTrainRuns.get() === pq)
    } finally {
      Similarity.invalidateIvf(spark, d); Similarity.invalidatePq(spark, d)
    }
  }

  test("planAnn calibrates on a sampled sub-corpus when calibrationDir is set") {
    val full = Files.createTempDirectory("planfull").toString
    val samp = Files.createTempDirectory("plansamp").toString
    graft.tools.SyntheticEmbeddings.write(spark, full,
      graft.tools.SyntheticEmbeddings.clustered(spark, 4000, nBlobs = 16, sigma = 0.2))
    // the sample is a strict SUBSET of the full corpus — the documented
    // 100 TB recipe (operators are dir-bound, so the whole calibration,
    // truth pass included, runs at sample cost)
    graft.tools.SyntheticEmbeddings.write(spark, samp,
      Similarity.emb(spark, full).filter(col("vec_id") % 8 === 0)
        .select(col("vec_id"), col("v").cast("array<float>").as("embedding"),
          lit(0).as("label")))
    try {
      val plan = Similarity.planAnn(spark, full, targetRecall = 0.3,
        calibrationDir = Some(samp))
      assert(plan.calibratedRecall >= 0.3, s"plan misses its target on the sample: $plan")
      assert(plan.scanFraction < 1.0, s"a sublinear plan clears 0.3 on blobs: $plan")
      // the chosen plan executes on the FULL corpus
      val served = Similarity.runAnnPlan(spark, full, plan, Seq(1L, 2L), k = 5)
      assert(served.select("qid").distinct().count() === 2)
      // memoized per calibration dir (a different sample is a different key)
      assert(Similarity.planAnnCached(spark, full, 0.3, calibrationDir = Some(samp)) === plan)
    } finally {
      Seq(full, samp).foreach { d =>
        Similarity.invalidateIvf(spark, d); Similarity.invalidatePq(spark, d)
      }
    }
  }
}
