package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Semantic checks for BM25 + hybrid retrieval on a crafted corpus where
  * the ranking behavior is reasoned out by hand (the DuckDB oracle proves
  * engine parity; these prove the operators mean what they claim). */
class TextRankingSpec extends SparkSpec {

  private def writeFixture(): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("rankfix").toString
    val docs = Seq(
      (0L, "spark join window spark", "en", "s", 23L),          // the query doc
      (1L, "spark join window fast engine", "en", "s", 29L),    // matches all 3 terms
      (2L, "spark fast table row scan", "en", "s", 25L),        // matches spark only
      (3L, "join join join join join join join join", "en", "s", 40L), // tf-saturation case
      (4L, "window", "en", "s", 6L),                            // short doc, one match
      (5L, "table row value data batch", "en", "s", 26L),       // no match
      (6L, "spark join", "en", "s", 10L))                       // short, two matches
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val base = (1 to 64).map(i => math.sin(i.toDouble).toFloat).toArray
    def rot(k: Int) = (1 to 64).map(i => math.cos(i * (k + 2.0)).toFloat).toArray
    Seq(
      (0L, base, 0),
      (1L, base.map(x => x * 2.0f), 0), // colinear with the query: ANN rank 1
      (2L, rot(1), 1), (3L, rot(2), 1), (4L, rot(3), 1),
      (5L, rot(4), 2), (6L, rot(5), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val dir: String = writeFixture()

  test("postings index: tf counts and denormalized doc length") {
    val p = TextRanking.postings(spark, dir)
      .filter(col("doc_id") === 0L).collect()
      .map(r => r.getAs[String]("term") -> (r.getAs[Long]("tf"), r.getAs[Long]("dl"))).toMap
    assert(p === Map("spark" -> (2L, 4L), "join" -> (1L, 4L), "window" -> (1L, 4L)))
  }

  test("bm25: only matching docs surface, all scores positive") {
    val r = TextRanking.bm25TopK(spark, dir, Seq("spark", "join", "window"), 10).collect()
    val ids = r.map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(0L, 1L, 2L, 3L, 4L, 6L)) // doc 5 shares no term
    assert(r.forall(_.getAs[Double]("score") > 0.0))
  }

  test("bm25 length normalization: same tf, shorter doc scores higher") {
    // docs 1 and 4 both have tf(window)=1; dl(4)=1 << dl(1)=5
    val s = TextRanking.bm25TopK(spark, dir, Seq("window"), 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(s(4L) > s(1L))
  }

  test("bm25 tf saturation: 8x the tf is worth less than (k1+1)x one occurrence") {
    val s = TextRanking.bm25TopK(spark, dir, Seq("join"), 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // doc 3 is all-"join" (tf=8) vs doc 6 (tf=1, dl=2): saturation + length
    // normalization keep the spam doc under the k1+1 multiple of the short hit
    assert(s(3L) < s(6L) * (TextRanking.K1 + 1.0))
  }

  test("multi-query bm25 never returns the query doc and ranks contiguously") {
    val r = TextRanking.bm25TopKFor(spark, dir, Seq(0L), 5).collect()
    assert(r.forall(_.getAs[Long]("doc_id") !== 0L))
    val ranks = r.map(_.getAs[Long]("bm_rank")).sorted.toSeq
    assert(ranks === (1L to ranks.length).toSeq)
  }

  test("hybrid rrf: the doc that is top in BOTH modalities wins") {
    // doc 1 matches all three of query-doc 0's terms (BM25 rank 1) and is
    // colinear with its embedding (ANN rank 1) — fusion must keep it first
    val r = TextRanking.hybridRrfTopK(spark, dir, Seq(0L), 5).collect()
    assert(r.head.getAs[Long]("doc_id") === 1L)
    // present-in-both beats present-in-one: 2/(60+ranks) vs 1/(60+rank)
    val top = r.head.getAs[Double]("rrf_score")
    assert(top > 1.0 / 61.0)
  }

  test("rag context: budget-prefix of the fused ranking, cumulative sums exact") {
    val top = TextRanking.hybridRrfTopK(spark, dir, Seq(0L), 5).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    val wordsOf = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty).toLong).toMap
    val packed = TextRanking.ragContext(spark, dir, Seq(0L), k = 5, budgetWords = 1000L)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_words"), r.getAs[Long]("cum_words")))
    // a generous budget packs the whole top-k, in fused order
    assert(packed.map(_._2).toSeq === top)
    // cumulative sums are exact running totals of the doc word counts
    var cum = 0L
    for ((_, d, nw, cw) <- packed) {
      assert(nw === wordsOf(d)); cum += nw; assert(cw === cum)
    }
    // a budget below the first doc's length packs nothing; a budget of
    // exactly the first two docs cuts after rank 2 (prefix semantics)
    assert(TextRanking.ragContext(spark, dir, Seq(0L), 5,
      budgetWords = wordsOf(top.head) - 1).count() === 0L)
    val two = wordsOf(top.head) + wordsOf(top(1))
    assert(TextRanking.ragContext(spark, dir, Seq(0L), 5, budgetWords = two)
      .collect().map(_.getAs[Long]("doc_id")).toSeq === top.take(2))
  }

  test("hybrid rrf ann routing: probe-all composed leg == exact leg, auto prefers the pruned probe") {
    val brute = TextRanking.hybridRrfTopK(spark, dir, Seq(0L), 3, kEach = 4).collect()
    // probe-all + corpus-wide shortlist makes the composed leg exact
    // top-kEach, so the fused output is row-for-row the brute hybrid —
    // routing changes the probe, never the fusion algebra
    val all = TextRanking.hybridRrfTopK(spark, dir, Seq(0L), 3, kEach = 4,
      method = "ivfpq", nprobe = 16, shortlist = 1000).collect()
    assert(all.map(_.toString).toSeq === brute.map(_.toString).toSeq)
    // facade "auto": with composed markers present the vector leg is the
    // persisted c_id-pruned probe, same rows out
    Similarity.buildIvfPqIndex(spark, dir)
    try {
      val auto = graft.Graft.hybridSearch(spark, dir, Seq(0L), 3, kEach = 4,
        nprobe = 16, shortlist = 1000)
      assert(auto.collect().map(_.toString).toSeq === brute.map(_.toString).toSeq)
      val plan = auto.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("partitionfilters: [c_id"),
        s"auto-routed hybrid must carry a c_id partition filter on the vector leg:\n$plan")
    } finally {
      def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
      Seq(Similarity.ivfPqPostingsPath(dir), Similarity.ivfIndexPath(dir),
        Similarity.pqIndexPath(dir)).foreach(p => rm(new java.io.File(p)))
      Similarity.invalidateIvf(spark, dir)
      Similarity.invalidatePq(spark, dir)
    }
  }

  test("bm25 probe plan: lexicon broadcasts, no cartesian, single agg shuffle") {
    val plan = TextRanking.bm25TopK(spark, dir, Seq("spark", "window"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("session-cache bound: over-bound corpus serves uncached postings, same scores") {
    val d2 = writeFixture()
    val q = Seq("spark", "join", "window")
    val cachedScores = TextRanking.bm25TopK(spark, d2, q, 10).collect().map(_.toString).toSeq
    assert(graft.core.SessionCache.contains(spark, "bm25_postings", d2),
      "an in-bound corpus must install the session cache")
    graft.core.SessionCache.invalidate(spark, "bm25_postings", d2)
    graft.core.SessionCache.invalidate(spark, "bm25_df", d2)
    spark.conf.set(TextRanking.MaxSessionCacheBytesConf, "1")
    try {
      val uncached = TextRanking.bm25TopK(spark, d2, q, 10).collect().map(_.toString).toSeq
      assert(uncached === cachedScores, "the cache gate must never change scores")
      assert(!graft.core.SessionCache.contains(spark, "bm25_postings", d2),
        "an over-bound corpus must NOT pin the tokenized postings in the session")
    } finally spark.conf.unset(TextRanking.MaxSessionCacheBytesConf)
  }

  test("persisted text index: pruned probe, identical scores, crash-safe fallback") {
    val d2 = writeFixture()
    val q = Seq("spark", "join", "window")
    val before = TextRanking.bm25TopK(spark, d2, q, 10).collect().toSeq
    val beforeMulti = TextRanking.bm25TopKFor(spark, d2, Seq(0L), 5).collect().toSeq

    TextRanking.buildTextIndex(spark, d2)
    // the probe must carry a literal bucket partition filter (static
    // pruning — the posting-list fetch, not a corpus scan)
    val plan = TextRanking.bm25TopK(spark, d2, q, 10)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("partitionfilters: [bucket") ||
      plan.contains("partitionfilters: [isnotnull(bucket"), s"no bucket pruning:\n$plan")
    assert(TextRanking.bm25TopK(spark, d2, q, 10).collect().toSeq === before)
    assert(TextRanking.bm25TopKFor(spark, d2, Seq(0L), 5).collect().toSeq === beforeMulti)

    // crash simulation: stats marker gone, stale postings linger — the
    // probe must fall back to the in-session index, results unchanged
    graft.core.Fs.delete(spark, TextRanking.textStatsPath(d2))
    TextRanking.invalidateTextIndex(spark, d2)
    assert(TextRanking.bm25TopK(spark, d2, q, 10).collect().toSeq === before)
  }

  test("incremental append + compaction == full rebuild, idempotent under retry") {
    val q = Seq("spark", "join", "window")
    // reference: the full 7-doc corpus indexed in one build
    val full = writeFixture()
    TextRanking.buildTextIndex(spark, full)
    val want = TextRanking.bm25TopK(spark, full, q, 10).collect().toSeq
    val wantStats = TextRanking.corpusStats(spark, full)

    // incremental: base = docs 0-3, then {4,5} and {6} appended
    val inc = Files.createTempDirectory("rankinc").toString
    val all = spark.read.parquet(s"$full/documents.parquet")
    all.filter(col("doc_id") <= 3L).write.parquet(s"$inc/documents.parquet")
    TextRanking.buildTextIndex(spark, inc)
    TextRanking.appendToTextIndex(spark, inc, all.filter(col("doc_id").isin(4L, 5L)), 1L)
    TextRanking.appendToTextIndex(spark, inc, all.filter(col("doc_id") === 6L), 2L)
    assert(TextRanking.corpusStats(spark, inc) === wantStats)
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq === want)
    // crash repair: re-running a batch under its id changes nothing
    TextRanking.appendToTextIndex(spark, inc, all.filter(col("doc_id") === 6L), 2L)
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq === want)
    // compaction is a pure relayout: delta gone, scores and stats identical
    TextRanking.compactTextIndex(spark, inc)
    assert(!graft.core.Fs.exists(spark, TextRanking.textDeltaPath(inc)))
    assert(!graft.core.Fs.exists(spark, TextRanking.textDeltaStatsPath(inc)))
    assert(TextRanking.corpusStats(spark, inc) === wantStats)
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq === want)
    TextRanking.compactTextIndex(spark, inc) // nothing staged: no-op
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq === want)
  }

  test("keepRecent compaction folds old batches, keeps the newest replayable") {
    val q = Seq("spark", "join", "window")
    val full = writeFixture()
    TextRanking.buildTextIndex(spark, full)
    val want = TextRanking.bm25TopK(spark, full, q, 10).collect().toSeq

    val inc = Files.createTempDirectory("rankkeep").toString
    val all = spark.read.parquet(s"$full/documents.parquet")
    all.filter(col("doc_id") <= 3L).write.parquet(s"$inc/documents.parquet")
    TextRanking.buildTextIndex(spark, inc)
    TextRanking.appendToTextIndex(spark, inc, all.filter(col("doc_id").isin(4L, 5L)), 1L)
    TextRanking.appendToTextIndex(spark, inc, all.filter(col("doc_id") === 6L), 2L)
    TextRanking.compactTextIndex(spark, inc, keepRecent = 1)
    // batch 1 folded (its partitions gone), batch 2 still delta
    assert(!graft.core.Fs.exists(spark, s"${TextRanking.textDeltaPath(inc)}/batch_id=1"))
    assert(graft.core.Fs.exists(spark, s"${TextRanking.textDeltaPath(inc)}/batch_id=2"))
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq === want)
    // the kept batch is still replayable: re-running it changes nothing
    TextRanking.appendToTextIndex(spark, inc, all.filter(col("doc_id") === 6L), 2L)
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq === want)
    // nothing old enough to fold: keepRecent=1 with one batch is a no-op
    TextRanking.compactTextIndex(spark, inc, keepRecent = 1)
    assert(graft.core.Fs.exists(spark, s"${TextRanking.textDeltaPath(inc)}/batch_id=2"))
    // a full fold afterwards still lands exactly
    TextRanking.compactTextIndex(spark, inc)
    assert(!graft.core.Fs.exists(spark, TextRanking.textDeltaPath(inc)))
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq === want)
  }

  test("a delta batch without its stats row (crashed append) is invisible") {
    val d2 = writeFixture()
    val q = Seq("spark", "join", "window")
    val inc = Files.createTempDirectory("rankcrash").toString
    val all = spark.read.parquet(s"$d2/documents.parquet")
    all.filter(col("doc_id") <= 5L).write.parquet(s"$inc/documents.parquet")
    TextRanking.buildTextIndex(spark, inc)
    val baseOnly = TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq
    val baseStats = TextRanking.corpusStats(spark, inc)
    TextRanking.appendToTextIndex(spark, inc, all.filter(col("doc_id") === 6L), 7L)
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq !== baseOnly)
    // simulate the crash window: postings landed, the stats row did not
    graft.core.Fs.delete(spark, s"${TextRanking.textDeltaStatsPath(inc)}/batch_id=7")
    TextRanking.invalidateTextIndex(spark, inc)
    assert(TextRanking.corpusStats(spark, inc) === baseStats)
    assert(TextRanking.bm25TopK(spark, inc, q, 10).collect().toSeq === baseOnly)
  }

  test("append demands a persisted index; a rebuild deletes the stale delta") {
    val d2 = writeFixture()
    val one = spark.read.parquet(s"$d2/documents.parquet").filter(col("doc_id") === 0L)
    val bare = Files.createTempDirectory("rankbare").toString
    one.write.parquet(s"$bare/documents.parquet")
    intercept[IllegalArgumentException] {
      TextRanking.appendToTextIndex(spark, bare, one, 1L)
    }
    TextRanking.buildTextIndex(spark, bare)
    TextRanking.appendToTextIndex(spark, bare, one.withColumn("doc_id", lit(9L)), 1L)
    assert(graft.core.Fs.exists(spark, TextRanking.textDeltaPath(bare)))
    // the rebuild's fresh marker must not validate the old delta
    TextRanking.buildTextIndex(spark, bare)
    assert(!graft.core.Fs.exists(spark, TextRanking.textDeltaPath(bare)))
    assert(!graft.core.Fs.exists(spark, TextRanking.textDeltaStatsPath(bare)))
  }

  test("incremental replay matches the one-shot index on the fixture corpus") {
    val d2 = writeFixture()
    TextRanking.buildTextIndex(spark, d2)
    val q = Seq("spark", "join", "window")
    val want = TextRanking.bm25TopK(spark, d2, q, 10).collect().toSeq
    assert(TextRanking.incrementalBm25Replay(spark, d2, q, 10).collect().toSeq === want)
  }

  test("scores are stable across repeated evaluation (decimal sum, no order drift)") {
    val a = TextRanking.bm25TopK(spark, dir, Seq("spark", "join", "window"), 10).collect().toSeq
    val b = TextRanking.bm25TopK(spark, dir, Seq("spark", "join", "window"), 10).collect().toSeq
    assert(a === b)
  }
}
