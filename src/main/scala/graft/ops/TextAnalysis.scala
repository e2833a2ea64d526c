package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextHashing.{md5Long, words, shinglesOf, P}

/** Text-analysis operators for the training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting — all single-pass
  * narrow projections + hash aggregations (no shuffle except the final
  * groupBy where present), built only from codegen'd built-ins.
  */
object TextAnalysis {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Per-language corpus stats. */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), col("n_chars"), size(words(col("text"))).cast("long").as("n_words"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"),
        round(avg("n_words"), 4).as("avg_words"))
      .orderBy("lang")

  /** Canonical list lives on the fused expression (its StopMask bit
    * order is part of that contract). */
  private val StopWords: Seq[String] = graft.plans.TextStatsExpr.StopWords.toSeq

  /** Per-document quality score: length, word stats, stopword ratio,
    * punctuation ratio — the cheap heuristics a pretraining filter runs
    * before anything model-based. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    withQuality(docs(spark, dir))
      .select("doc_id", "n_chars_actual", "n_words", "avg_word_len",
        "stopword_ratio", "punct_ratio", "quality_score")
      .orderBy("doc_id")

  /** The quality metrics APPENDED to any docs-shaped frame (text kept) —
    * streaming-safe (no sort), so the curation pipeline's quality gate
    * runs inside foreachBatch on the same expressions the batch query
    * (and its oracle) use.
    *
    * Computed by the fused single-pass native expression
    * (plans/TextStatsExpr — r17 stage profiling measured the old
    * three-regex + lower/split/filter formulation at ~1,050
    * executor-CPU-seconds per 500k sf10 docs, the dominant cost of
    * every quality-gate consumer); OpsSpec pins each stat against the
    * declarative original, and the DuckDB oracles keep the independent
    * regex formulation, so the hash gate cross-checks every row. */
  def withQuality(df: DataFrame): DataFrame = {
    import graft.plans.{GraftExtensions => gx, TextStatsExpr => ts}
    val nWords = gx.textStat(col("text"), ts.NWords)
    val stopHits = gx.textStat(col("text"), ts.StopHits)
    val nonSpace = gx.textStat(col("text"), ts.NonSpace)
    val nPunct = length(col("text")) - gx.textStat(col("text"), ts.AlnumSpace)
    df.withColumn("n_chars_actual", length(col("text")).cast("long"))
      .withColumn("n_words", nWords)
      .withColumn("avg_word_len",
        round(nonSpace.cast("double") / nWords, 4))
      .withColumn("stopword_ratio", round(stopHits.cast("double") / nWords, 4))
      .withColumn("punct_ratio",
        round(nPunct.cast("double") / length(col("text")), 4))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_words") / lit(50.0)) * (lit(1.0) - col("punct_ratio")), 4))
  }

  /** Canonical marker table lives on the fused expression (its
    * MarkerMask bit layout is part of that contract). */
  private val LangMarkers: Seq[(String, Seq[String])] =
    graft.plans.TextStatsExpr.LangMarkers

  /** N-gram-heuristic language ID: count distinct marker-word hits per
    * language; predict the best-scoring language (ties broken by language
    * code order), 'und' (undetermined) when nothing hits.
    *
    * Scores come from ONE fused MarkerMask pass (plans/TextStatsExpr):
    * score_lang = popcount of the language's 5-bit mask window ==
    * the size(array_intersect(array_distinct(words), markers)) the
    * declarative form computed (distinctness is free in a presence
    * mask) — pinned in GraftExtensionsSpec, and the DuckDB oracle keeps
    * the independent intersect formulation. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.{GraftExtensions => gx, TextStatsExpr => ts}
    val scores = LangMarkers.zipWithIndex.map { case ((code, _), li) =>
      bit_count(shiftright(col("mm"), 5 * li).bitwiseAND(lit(31L)))
        .cast("long").as(s"score_$code")
    }
    val best = greatest(LangMarkers.map { case (code, _) => col(s"score_$code") }: _*)
    val predicted = LangMarkers.foldRight(lit("und"): Column) { case ((code, _), other) =>
      when(col(s"score_$code") === best && best > 0, lit(code)).otherwise(other)
    }
    // foldRight gives de < en < es < fr precedence on ties — deterministic
    val withScores = docs(spark, dir)
      .withColumn("mm", gx.textStat(col("text"), ts.MarkerMask))
      .select(col("doc_id") +: col("lang") +: scores: _*)
    withScores
      .withColumn("predicted_lang", predicted)
      .select("doc_id", "lang", "predicted_lang", "score_de", "score_en", "score_es", "score_fr")
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
        col("doc_id"),
        size(words(col("text"))).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).cast("long").as("bpe_ish_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"))
      .orderBy("doc_id")

  /** Repetition metrics (the Gopher-class quality signal the simple
    * length/punct heuristics miss): per doc, the fraction of all
    * word-bigram OCCURRENCES held by the single most frequent bigram,
    * and the distinct/total bigram ratio. Boilerplate and degenerate
    * generations ("the the the ...") spike the former and crater the
    * latter. One explode + two hash aggs — embarrassingly parallel. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOf(docs(spark, dir))

  /** Frame-level variant (docs-shaped input). Docs with fewer than two
    * words have no bigrams: frac 0, ratio 1 by convention. */
  def repetitionOf(docsDf: DataFrame): DataFrame = {
    val ws = col("ws")
    val bi = docsDf
      .withColumn("ws", words(col("text")))
      .select(col("doc_id"), explode(
        // guard: Spark's sequence(1, n) DESCENDS for n < 1 — an unguarded
        // short doc would fabricate bigrams from out-of-range indexes
        when(size(ws) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(ws) - 1),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))).as("bg"))
    val perDoc = bi.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), max("c").as("top_c"),
        count(lit(1)).as("n_distinct"))
    docsDf.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left") // explode dropped bigram-less docs
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("top_c") / col("n_bigrams"), lit(0.0)), 4).as("top_bigram_frac"),
        round(coalesce(col("n_distinct") / col("n_bigrams"), lit(1.0)), 4).as("distinct_bigram_ratio"))
      .orderBy("doc_id")
  }

  // PII patterns a curation pipeline scrubs before training: kept
  // deliberately simple/deterministic (regex-auditable), one codegen'd
  // regexp_replace chain per doc — no UDF, no second scan
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII redaction: emails/IPv4s/phone-shaped numbers replaced with
    * typed placeholder tags, with per-doc match counts — the scrub stage
    * of a pretraining pipeline, as a narrow projection. */
  def redact(spark: SparkSession, dir: String): DataFrame =
    redactOf(docs(spark, dir))

  /** Frame-level variant (docs-shaped input; text lower-cased first so
    * the patterns and their counts are case-stable). */
  def redactOf(docsDf: DataFrame): DataFrame = {
    val lowered = lower(col("text"))
    def hits(re: String) =
      size(regexp_extract_all(lowered, lit(re), lit(0))).cast("long")
    docsDf.select(
        col("doc_id"),
        hits(EmailRe).as("n_emails"),
        hits(Ipv4Re).as("n_ips"),
        hits(PhoneRe).as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(lowered, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>").as("redacted"))
      .withColumn("redacted_chars", length(col("redacted")).cast("long"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified 10% sample per language: hash-mod on the
    * content fingerprint (never rand() — re-runs and the oracle agree;
    * spreading by content hash is uniform regardless of doc_id order). */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(md5Long(lower(col("text"))) % 10 === 0)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("lang")

  /** Context-window chunking — the training-prep step that splits long
    * documents into ~`maxTokens`-word pieces with `overlap` words of
    * carried context (stride = maxTokens - overlap; chunk i covers
    * words [i·stride+1, i·stride+maxTokens]). Documents shorter than
    * maxTokens yield themselves as chunk 0; the chunk count
    * max(1, ceil((n - overlap) / stride)) guarantees every word lands
    * in some chunk and no chunk starts past the text.
    *
    * Pure narrow projection + posexplode — per-doc work is linear in
    * its length, no shuffle at all (the explode multiplies rows inside
    * the scan's partitions), so the operator scales with corpus bytes
    * exactly like a projection. Returns (doc_id, chunk_idx, chunk_text,
    * n_tokens). */
  def chunkDocuments(spark: SparkSession, dir: String,
                     maxTokens: Int = 64, overlap: Int = 8): DataFrame =
    chunkDocumentsDf(docs(spark, dir), maxTokens, overlap)
      .orderBy("doc_id", "chunk_idx") // query-face determinism only

  /** Frame-shaped core of `chunkDocuments` (needs doc_id + text) —
    * UNSORTED: the chunk explosion itself is a pure narrow projection
    * (no exchange anywhere); the dir-face adds the presentation sort. */
  def chunkDocumentsDf(d: DataFrame, maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens=$maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap=$overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val nChunks = greatest(lit(1L),
      ceil((size(col("ws")) - lit(overlap)) / lit(stride.toDouble)).cast("long"))
    d.withColumn("ws", words(col("text")))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), nChunks - 1),
          i => slice(col("ws"), (i * stride + 1).cast("int"), lit(maxTokens)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  /** The first BPE merge table: corpus-weighted adjacent character-pair
    * frequencies over the word vocabulary — what a byte-pair-encoding
    * tokenizer trainer computes each round to pick its next merge
    * (counts weighted by word occurrence, the classic formulation).
    * `k` = how many top pairs to return (n desc, pair asc tie-break).
    *
    * Scale shape: the first aggregation collapses the corpus to its
    * VOCABULARY (the standard word-count shuffle — at 100 TB this is
    * the only corpus-sized stage and it partial-aggregates map-side);
    * pair explosion and the second aggregation run over vocab-sized
    * data, and the top-k is a TakeOrderedAndProject. */
  def bpeTopPairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    docs(spark, dir)
      .select(explode(words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .filter(length(col("word")) >= 2)
      .withColumn("pair",
        explode(expr("transform(sequence(1, length(word)-1), i -> substring(word, i, 2))")))
      .groupBy("pair").agg(sum("wcnt").cast("long").as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)

  /** The word-level vocabulary a BPE trainer iterates on: one row per
    * distinct word with its corpus count and symbol sequence (initially
    * single characters). This is the ONLY corpus-sized computation in
    * training — every merge round after it is vocab-sized. */
  private def bpeVocab(d: DataFrame): DataFrame =
    d.select(explode(words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("wcnt"))
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Adjacent symbol pairs of a vocab frame, corpus-weighted. */
  private def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("wcnt"), explode(expr(
        // NB Spark's arr[i] is 0-based (the oracle's DuckDB syms[i] is 1-based)
        "transform(sequence(0, size(syms)-2), i -> struct(syms[i] AS l, syms[i+1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("wcnt").cast("long").as("n"))

  /** Greedy left-to-right application of a BATCH of pairwise
    * token-disjoint merge rules to every symbol sequence, as one
    * codegen'd array fold: append x, except when the accumulator ends
    * in some rule's l and x = that rule's r — then replace that tail
    * with the merged token. For a single rule this equals the canonical
    * pointer-walk greedy merge: a cascade (the just-merged token
    * immediately re-merging as the LEFT side) would need l+r = l,
    * impossible for non-empty r, so the fold never merges a token the
    * walk would have skipped (OpsSpec pins "aaa" -> [aa, a]). For a
    * batch, disjointness means a position matches at most one rule and
    * no rule's output string equals another rule's operand (the
    * selection guard checks the whole pair table), so one simultaneous
    * pass equals applying the rules one-after-another in rank order. */
  private def bpeApplyMerges(pairs: Seq[(String, String)]): Column =
    aggregate(col("syms"), lit(Array.empty[String]),
      (acc, x) => pairs.foldRight(concat(acc, array(x))) {
        case ((l, r), els) =>
          when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(els)
      })

  /** ITERATIVE BPE training over the corpus word vocabulary — the public
    * recipe (Sennrich et al. 2016): count adjacent symbol pairs weighted
    * by word frequency, merge the most frequent pair everywhere, repeat.
    * Tie-break (n desc, "l r" asc) keeps the table engine-portable.
    *
    * BATCHED ROUNDS: each round applies up to `maxBatch` merges whose
    * simultaneous application is PROVABLY order-equivalent to the
    * sequential loop (`maxBatch = 1` IS the sequential loop — the
    * equivalence oracle OpsSpec trains both ways and compares). The
    * batch is the longest ranked strict prefix p_1..p_m such that:
    *
    *  1. pairwise token-disjoint (truncate at the FIRST overlap, so
    *     every old pair sharing a token with the batch ranks >= m+1) —
    *     disjoint merges cannot change each other's candidate counts;
    *  2. a self-pair (l == r) closes the batch inclusively: its merge
    *     creates new pairs (e.g. "aaa" -> aa adjacent a) whose count is
    *     bounded only by ITS OWN count, so nothing may merge after it
    *     in the same round;
    *  3. count(p_m) > count(p_{m+1}) STRICTLY (skipped when the pair
    *     list is exhausted): every new pair created by merging p_j is
    *     count-bounded by an old pair overlapping p_j — which ranks
    *     >= m+1 by (1) — so the strict gap guarantees the sequential
    *     picker would still choose p_2..p_m over any newly created
    *     pair;
    *  4. no candidate's merged output string equals a token still
    *     adjacent anywhere in the corpus (checked against the full
    *     pair table): a string-equality collision would let merge j
    *     INCREASE a later pair's count, breaking (3)'s bound;
    *  5. no candidate's merged output equals an EARLIER candidate's
    *     output (e.g. ("a","bc") and ("ab","c"), both -> "abc"):
    *     token-disjointness does not forbid this, and two same-output
    *     rewrites in one round would POOL their newly created pairs
    *     ((x,"abc") fed by both), up to 2x the per-rewrite bound that
    *     (3)'s strict gap relies on. Defense-in-depth: a 600k-trial
    *     trainer simulation plus an exhaustive depth-5 merge-table
    *     state search found NO corpus reachable from character
    *     initialization where two token-disjoint equal-output pairs
    *     are simultaneously adjacent (the greedy fold leaves merge
    *     debris between any two operands that escape a rule pass, so
    *     the two tokenizations of the shared output string exclude
    *     each other) — but the equivalence proof should not lean on
    *     that meta-argument, so the batch closes at the first
    *     duplicate output regardless.
    *
    * Scale shape: ONE corpus-sized word-count shuffle builds the vocab;
    * each round is two vocab-sized aggregates (top-(B+1) collect +
    * collision probe) and one vocab-sized narrow rewrite — ~3 jobs per
    * round of up to `maxBatch` merges, vs 2 jobs PER MERGE sequentially.
    * A 32k-merge vocabulary at maxBatch=64 is ~hundreds of rounds
    * instead of ~64k driver-coordinated jobs. Rounds persist their
    * vocab and drop the previous one, so round r never replays rounds
    * 1..r-1 and plan depth stays constant.
    *
    * Returns the merge list in rank order plus the FINAL rewritten
    * vocab frame (persisted; caller releases with `bpeReleaseVocab`
    * when done — a plain unpersist() leaks the final localCheckpoint
    * cut's blocks, which live in checkpoint storage where Dataset
    * unpersist is a no-op; the cut is registered in `bpeCutRdds` at
    * exit and bpeReleaseVocab frees both). */
  def bpeTrainMerges(d: DataFrame, numMerges: Int,
                     maxBatch: Int = 16): (Seq[(String, String, Long)], DataFrame) = {
    require(numMerges >= 1, s"numMerges=$numMerges must be positive")
    require(maxBatch >= 1, s"maxBatch=$maxBatch must be positive")
    bpeTrainRuns.incrementAndGet()
    var vocab = bpeVocab(d).persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    var roundsSinceCut = 0
    var lastCutRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    while (merges.size < numMerges && !exhausted) {
      bpeMergeRounds.incrementAndGet()
      val want = math.min(maxBatch, numMerges - merges.size)
      val cands = bpePairCounts(vocab)
        .orderBy(col("n").desc, concat_ws(" ", col("l"), col("r")).asc)
        .limit(want + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cands.isEmpty) exhausted = true // every word fully merged
      else {
        val m = bpeSelectBatch(cands, want, outs => {
          val collisions: Set[String] = bpePairCounts(vocab)
            .filter(col("l").isin(outs: _*) || col("r").isin(outs: _*))
            .select(col("l"), col("r")).collect()
            .flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
          collisions
        })
        val batch = cands.take(m)
        merges ++= batch
        val next = vocab
          .withColumn("syms", bpeApplyMerges(batch.map(c => (c._1, c._2))))
          .persist()
        next.count() // materialize before dropping the parent
        vocab.unpersist()
        vocab = next
        roundsSinceCut += 1
        // Sever the cached-plan NESTING every few rounds: each round's
        // InMemoryRelation embeds the previous round's full (adaptive)
        // cached plan, and AQE's per-query explain walks that nest at
        // ~2^depth nodes — a long run hangs in plan STRINGIFICATION
        // long before compute matters (observed: 200 sequential rounds
        // pinned the driver in generateTreeString). localCheckpoint
        // replaces the plan with a flat LogicalRDD, bounding depth at
        // CutEvery; the previous cut's blocks are freed once the new
        // cut has materialized.
        if (roundsSinceCut >= CutEvery) {
          val cut = vocab.localCheckpoint(true)
          vocab.unpersist()
          lastCutRdd.foreach(_.unpersist(blocking = false))
          lastCutRdd = checkpointRddOf(cut)
          vocab = cut
          roundsSinceCut = 0
        }
      }
    }
    // Track the final cut so the caller can free it: the returned vocab
    // either IS the cut (roundsSinceCut == 0) or is a persisted frame
    // whose eviction-recompute path still references the cut's RDD, so
    // neither case may free it HERE — bpeReleaseVocab does, once the
    // caller declares the frame dead (round-12 advice: each training
    // run used to leak one vocab-sized block set for the session).
    lastCutRdd.foreach(rdd => bpeCutRdds.put(rdd.id, rdd))
    (merges.toSeq, vocab)
  }

  /** Final-cut RDDs of completed training runs, keyed by RDD id —
    * freed by bpeReleaseVocab when the owning vocab frame is released. */
  private val bpeCutRdds =
    new java.util.concurrent.ConcurrentHashMap[Int, org.apache.spark.rdd.RDD[_]]

  /** Release a vocab frame returned by bpeTrainMerges: unpersists the
    * frame AND the final localCheckpoint cut behind it (when one
    * exists — short trainings never cut and this degrades to a plain
    * unpersist). Only call when the frame is truly dead: after this,
    * an evicted downstream cache of the frame cannot recompute. */
  def bpeReleaseVocab(v: DataFrame): Unit = {
    v.unpersist()
    checkpointRddOf(v).foreach { rdd =>
      Option(bpeCutRdds.remove(rdd.id)).foreach(_.unpersist(blocking = false))
    }
  }

  /** Batch-size selection for one bpeTrainMerges round: the longest
    * ranked prefix of `cands` satisfying order-equivalence rules
    * (1)-(5) documented on bpeTrainMerges. `adjacentTokensNear(outs)`
    * returns every token adjacent (as l or r of any current pair) to a
    * row containing one of `outs` — including the outs themselves when
    * they are corpus-adjacent — i.e. the rule-(4) probe. Factored out
    * of the trainer so the selection rules are testable on engineered
    * candidate lists the corpus-level random sweep cannot reach (the
    * rule-(5) duplicate-output case is unreachable from character
    * initialization — see the rule's note — so only a direct fixture
    * can exercise it). Always returns >= 1: a single merge IS the
    * sequential step. */
  private[ops] def bpeSelectBatch(
      cands: Seq[(String, String, Long)], want: Int,
      adjacentTokensNear: Seq[String] => Set[String]): Int = {
    val listExhausted = cands.length < want + 1
    // (1) + (2) + (5): longest disjoint strict prefix; self-pair closes
    // inclusively; a duplicate merged output closes EXCLUSIVELY (the
    // same treatment as a rule-1 token overlap)
    val used = scala.collection.mutable.Set.empty[String]
    val outsSeen = scala.collection.mutable.Set.empty[String]
    var m = 0
    var open = true
    while (open && m < math.min(want, cands.length)) {
      val (l, r, _) = cands(m)
      if (used.contains(l) || used.contains(r)) open = false
      else if (outsSeen.contains(l + r)) open = false // rule (5)
      else {
        used += l; used += r; outsSeen += l + r; m += 1
        if (l == r) open = false // rule (2)
      }
    }
    // (4): merged outputs must not collide with any adjacent token.
    // Probed only when a real batch formed — a single merge IS the
    // sequential step, so tie/overlap-heavy rounds pay no extra job
    // (and the probe stays an uncached aggregate: caching the pair
    // table every round costs more than the probes it serves).
    if (m >= 2) {
      val outs = cands.take(m).map { case (l, r, _) => l + r }
      val collisions = adjacentTokensNear(outs)
      val firstCollision = cands.take(m).indexWhere { case (l, r, _) =>
        collisions.contains(l + r) }
      if (firstCollision >= 0) m = math.max(firstCollision, 1)
    }
    // (3): strict count gap to the first excluded candidate
    if (!(listExhausted && m == cands.length))
      while (m >= 2 && cands(m - 1)._3 == cands(m)._3) m -= 1
    if (m < 1) m = 1 // a single merge is the sequential step itself
    m
  }

  /** Plan-depth bound for the training loop (see the localCheckpoint
    * note in bpeTrainMerges). */
  private val CutEvery = 8

  /** The cached RDD behind a localCheckpoint'd frame — so the trainer
    * can free a superseded cut's blocks (Dataset.unpersist is a no-op
    * on checkpoint storage). */
  private def checkpointRddOf(df: DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Session-cached trained tokenizer for (dir, numMerges): the merge
    * list plus the final rewritten vocab, trained ONCE per session — a
    * trained tokenizer is a reusable artifact, and every consumer
    * (`bpe_merges`, token counts, shard budgets, encode) shares one
    * training run instead of re-running the merge loop per query. The
    * vocab frame rides SessionCache (bounded: one row per distinct
    * word); the merge list (numMerges rows) rides a companion map
    * evicted by the same end-of-session hook. Callers must NOT
    * unpersist the returned vocab. */
  def bpeTrained(spark: SparkSession, dir: String,
                 numMerges: Int = 10): (Seq[(String, String, Long)], DataFrame) = {
    val key = (spark, dir, numMerges)
    // prefer the committed persisted artifact (train-once / encode-
    // anywhere): a cold session with the marker present never touches
    // the training path
    def loadOrTrain(): (Seq[(String, String, Long)], DataFrame) =
      if (hasTokenizer(spark, dir, numMerges)) {
        val m = spark.read.parquet(tokenizerMergesPath(dir))
          .orderBy("merge_rank").collect().toSeq
          .map(r => (r.getAs[String]("l"), r.getAs[String]("r"), r.getAs[Long]("n")))
        (m, spark.read.parquet(tokenizerVocabPath(dir))
          .select("word", "wcnt", "syms"))
      } else bpeTrainMerges(docs(spark, dir), numMerges)
    val vocab = graft.core.SessionCache.getOrBuild(spark, s"bpe_vocab_$numMerges", dir) {
      val (m, v) = loadOrTrain()
      trainedMergeLists.put(key, m)
      v
    }
    val m = trainedMergeLists.get(key)
    if (m != null) (m, vocab)
    else {
      // the vocab outlived its merge list (defensive: the two are
      // installed together and evicted together) — recompute the list,
      // keep the cached vocab frame. The recomputed frame is NOT
      // unpersisted: its plan sameResults the cached vocab's, so
      // unpersisting it would evict the shared CacheManager entry out
      // from under the installed frame
      val (m2, _) = loadOrTrain()
      trainedMergeLists.put(key, m2)
      (m2, vocab)
    }
  }

  // -- persisted tokenizer artifact ----------------------------------
  // Family convention (text/vector indexes): data files first, the
  // stats file LAST as the commit marker — a crash mid-build leaves no
  // marker and readers fall back to in-session training.

  def tokenizerVocabPath(dir: String): String = s"$dir/bpe_vocab.parquet"
  def tokenizerMergesPath(dir: String): String = s"$dir/bpe_merge_table.parquet"
  /** (num_merges, vocab_checksum) — written last, doubles as the commit
    * marker. */
  def tokenizerStatsPath(dir: String): String = s"$dir/bpe_stats.parquet"

  /** Train on `dir`'s corpus and persist the tokenizer (merge table +
    * applied vocab) beside the data (or at `at`): the train-once /
    * encode-anywhere artifact — a COLD session with the marker present
    * encodes without touching the training path at all
    * (`bpeTrained` prefers the persisted artifact; OpsSpec proves
    * zero-training reads via the run counter). */
  def buildTokenizer(spark: SparkSession, dir: String, numMerges: Int = 10,
                     at: Option[String] = None): Unit = {
    val target = at.getOrElse(dir)
    graft.core.Fs.delete(spark, tokenizerStatsPath(target)) // marker down
    val (merges, vocab) = bpeTrained(spark, dir, numMerges)
    vocab.select("word", "wcnt", "syms")
      .write.mode("overwrite").parquet(tokenizerVocabPath(target))
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r, n), i) => ((i + 1).toLong, l, r, n) }
      .toDF("merge_rank", "l", "r", "n").coalesce(1)
      .write.mode("overwrite").parquet(tokenizerMergesPath(target))
    val checksum = vocab
      .select(sum(md5Long(concat_ws(":", col("word"),
        concat_ws("|", col("syms")))) % P).cast("long").as("c"))
      .head().getLong(0)
    Seq((numMerges.toLong, checksum)).toDF("num_merges", "vocab_checksum")
      .coalesce(1).write.mode("overwrite").parquet(tokenizerStatsPath(target))
  }

  /** Whether a committed tokenizer trained with `numMerges` rounds is
    * present at `dir` (marker + both tables, merge count matching). */
  def hasTokenizer(spark: SparkSession, dir: String, numMerges: Int = 10): Boolean =
    graft.core.Fs.exists(spark, tokenizerStatsPath(dir)) &&
      graft.core.Fs.exists(spark, tokenizerVocabPath(dir)) &&
      graft.core.Fs.exists(spark, tokenizerMergesPath(dir)) &&
      (try spark.read.parquet(tokenizerStatsPath(dir))
        .head().getLong(0) == numMerges.toLong
       catch { case _: Throwable => false })

  /** Observability for the once-per-session training contract (specs
    * assert consumers share one run, and that a persisted tokenizer is
    * loaded without any run at all). */
  private[graft] val bpeTrainRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Driver-coordinated merge ROUNDS across all training runs — the
    * batching win is rounds << merges (OpsSpec asserts it; SCALING.md
    * tables it). */
  private[graft] val bpeMergeRounds = new java.util.concurrent.atomic.AtomicLong(0L)

  private val trainedMergeLists =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, Int), Seq[(String, String, Long)]]()
  locally {
    graft.core.SessionCache.onSessionEnd { s =>
      val it = trainedMergeLists.keySet().iterator()
      while (it.hasNext) if (it.next()._1 eq s) it.remove()
    }
  }

  /** `bpe_merges` query face: the first `numMerges` merges (rank, "l r"
    * pair, weighted count) stamped with an order-free checksum of the
    * final rewritten vocabulary — sum over words of
    * md5Long(word ':' syms-joined-'|') mod P. The checksum makes the
    * oracle sensitive to the REWRITE of every round, not just the pair
    * ranking (merge k's candidates only exist because merge k-1
    * rewrote the vocab). */
  def bpeMerges(spark: SparkSession, dir: String, numMerges: Int = 10): DataFrame = {
    val (merges, vocab) = bpeTrained(spark, dir, numMerges)
    val checksum = vocab
      .select(sum(md5Long(concat_ws(":", col("word"),
        concat_ws("|", col("syms")))) % P).cast("long").as("c"))
      .collect()(0).getLong(0)
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r, n), i) =>
      ((i + 1).toLong, s"$l $r", n, checksum)
    }.toDF("merge_rank", "pair", "n", "vocab_checksum")
  }

  /** Tokenizer-aware token counts: apply a trained merge table to the
    * corpus and count the resulting BPE tokens per document. The merge
    * rules are applied to the VOCAB (numMerges vocab-sized rewrites),
    * then docs join their words against the per-word token counts — the
    * corpus-sized work is one explode + join + sum, independent of the
    * merge count. Words whose text is empty count zero tokens.
    * Returns (doc_id, n_tokens) — what `packShards` budgets and
    * chunk windows should count once training consumes BPE tokens
    * rather than whitespace words. */
  def bpeTokenCounts(spark: SparkSession, dir: String, numMerges: Int = 10): DataFrame = {
    val d = docs(spark, dir)
    val (_, vocab) = bpeTrained(spark, dir, numMerges)
    val perWord = vocab
      .select(col("word"), size(col("syms")).cast("long").as("word_tokens"))
    val out = d
      .select(col("doc_id"), explode_outer(words(col("text"))).as("word"))
      .join(perWord.hint("broadcast"), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(coalesce(sum("word_tokens"), lit(0L)).as("n_tokens"))
      .orderBy("doc_id")
    // the vocab stays session-cached (bpeTrained); bounded by the
    // distinct-word count
    out
  }

  /** Full tokenizer ENCODE — the step that makes the trained merge
    * table a usable tokenizer: every selected document's text as its
    * BPE token stream (doc_id, pos, token), `pos` global across the
    * whole document. Training runs on the FULL corpus (so the vocab is
    * the same one `bpe_merges` checksums); encoding then touches only
    * the requested documents.
    *
    * Scale shape: the corpus-sized work is bpeTrainMerges' one word
    * count; encoding is a broadcast join of doc words against the
    * bounded (distinct-word) vocab, a per-document window for the token
    * offsets (bounded by document length, never corpus-sized
    * partitions), and one explode. Every word of every doc is in the
    * vocab by construction (trained on the same corpus), so the join is
    * inner and lossless. */
  def bpeEncode(spark: SparkSession, dir: String, numMerges: Int = 10,
                maxDocId: Long = 8): DataFrame = {
    val (_, vocab) = bpeTrained(spark, dir, numMerges)
    encodeWithVocab(docs(spark, dir).filter(col("doc_id") < maxDocId), vocab)
  }

  /** Encode an arbitrary docs-shaped frame against a word -> syms vocab
    * (every word of the frame must be in the vocab). */
  private def encodeWithVocab(sel: DataFrame, vocab: DataFrame): DataFrame = {
    val dw = sel
      .select(col("doc_id"), posexplode(words(col("text"))))
      .toDF("doc_id", "wpos", "word")
    // token offset of each word = tokens in the doc's preceding words
    val off = Window.partitionBy("doc_id").orderBy("wpos")
      .rowsBetween(Window.unboundedPreceding, -1)
    dw.join(vocab.select("word", "syms").hint("broadcast"), Seq("word"))
      .withColumn("woff", coalesce(sum(size(col("syms")).cast("long")).over(off), lit(0L)))
      .select(col("doc_id"), col("woff"), posexplode(col("syms")))
      .toDF("doc_id", "woff", "spos", "token")
      .select(col("doc_id"), (col("woff") + col("spos")).cast("long").as("pos"),
        col("token"))
      .orderBy("doc_id", "pos")
  }

  /** Apply a merge list in rank order to a 1-column `word` frame — the
    * canonical BPE APPLICATION to arbitrary (possibly out-of-training)
    * words: chars first, then each merge's greedy left-to-right rewrite,
    * each merge applied exactly once at its rank's turn.
    *
    * ONE projection regardless of merge count: the ranked table rides the
    * UDF closure (task-broadcast, numMerges rows) and each word is encoded
    * by a per-row loop. The per-merge `withColumn` fold this replaces
    * (kept below as [[applyMergesFold]], the spec-pinned reference law)
    * builds numMerges nested Projects — quadratic analyzer work and a
    * StackOverflowError in `DeduplicateRelations` at production vocab
    * sizes (16k-32k merges), i.e. it could never encode with the
    * tokenizer the trainer itself produces.
    *
    * Equivalence with the fold (pinned by OpsSpec): applying merges one
    * at a time in rank order is the same as repeatedly rewriting the
    * minimum-rank adjacent pair whose rank is STRICTLY ABOVE the last
    * rank applied — a pass at rank k leaves no (l,r) adjacency of rank k
    * behind (the merged token l+r can equal neither operand), and any
    * pair a later merge re-creates ranks above it, so the ascending-rank
    * walk visits exactly the merges the fold applies, in fold order.
    * O(len^2) map lookups per word, independent of numMerges. */
  def applyMerges(vocabWords: DataFrame,
                  merges: Seq[(String, String, Long)]): DataFrame = {
    val table: Array[(String, String)] = merges.map(m => (m._1, m._2)).toArray
    // FIRST-wins on a duplicate (l,r) pair, matching the fold (which
    // applies the first occurrence; toMap alone would keep the last) —
    // outside the trainer-produced domain, but the pinned law says
    // "equal to the fold", not "equal on trainer output" (r16 advice)
    val rank: Map[(String, String), Int] =
      table.zipWithIndex.reverse.map { case (p, i) => (p, i) }.toMap
    val enc = udf { (word: String) =>
      // null propagates like the fold's substring() did (r16 advice:
      // codePoints() on null NPE'd where the old fold returned null)
      if (word == null) null
      else {
      // code points, matching the fold's substring(word, i, 1) char split
      var syms: Array[String] =
        word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      var last = -1
      var done = syms.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val k = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (k > last && k < best) best = k
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (l, r) = table(best)
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              out += (l + r); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          last = best
          done = syms.length < 2
        }
      }
      syms
      }
    }
    vocabWords.withColumn("syms", enc(col("word")))
  }

  /** The superseded per-merge fold — numMerges nested Projects, analyzer
    * StackOverflow at production vocab sizes. Kept (package-private) as
    * the reference law the OpsSpec equivalence pin trains [[applyMerges]]
    * against at small merge counts. */
  private[graft] def applyMergesFold(vocabWords: DataFrame,
                                     merges: Seq[(String, String, Long)]): DataFrame =
    merges.foldLeft(
      vocabWords.withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))) {
      case (df, (l, r, _)) => df.withColumn("syms", bpeApplyMerges(Seq((l, r))))
    }

  /** Encode `corpusDir`'s documents with a tokenizer trained ELSEWHERE
    * and persisted at `tokenizerDir` — the cross-corpus face of the
    * train-once artifact. Out-of-training words are handled exactly like
    * a real tokenizer: char-split, then the persisted merges applied in
    * rank order (for in-training words this reproduces the persisted
    * syms verbatim, so no special casing anywhere). The merge table is
    * numMerges rows; the rewrite is over the NEW corpus's distinct
    * words — vocab-sized, one scan. */
  def bpeEncodeWith(spark: SparkSession, corpusDir: String, tokenizerDir: String,
                    numMerges: Int = 10, maxDocId: Long = 8): DataFrame = {
    require(hasTokenizer(spark, tokenizerDir, numMerges),
      s"no committed tokenizer (numMerges=$numMerges) at $tokenizerDir")
    val merges = spark.read.parquet(tokenizerMergesPath(tokenizerDir))
      .orderBy("merge_rank").collect().toSeq
      .map(r => (r.getAs[String]("l"), r.getAs[String]("r"), r.getAs[Long]("n")))
    val sel = docs(spark, corpusDir).filter(col("doc_id") < maxDocId)
    val vocab = applyMerges(
      sel.select(explode(words(col("text"))).as("word")).distinct(), merges)
    encodeWithVocab(sel, vocab)
  }

  /** Token-count histogram: docs bucketed by word-count decade — the
    * length-distribution panel of a dataset card. */
  def tokenHistogram(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(size(words(col("text"))).cast("long").as("nw"))
      .select((expr("nw div 10") * 10).as("bucket_lo"))
      .groupBy("bucket_lo")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("bucket_lo")

  /** Cross-modal join: text metrics + embedding cluster in one row
    * (documents.doc_id == embeddings.vec_id in the fixtures) — per
    * cluster: doc count, mean length, mean embedding norm. */
  def crossModal(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        sqrt(aggregate(transform(col("embedding").cast("array<double>"), x => x * x),
          lit(0.0), (acc, x) => acc + x)).as("nrm"))
    docs(spark, dir)
      .join(e, col("doc_id") === col("vec_id"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        round(sum(col("nrm").cast("decimal(20,10)")).cast("double") / count(lit(1)), 6).as("avg_norm"))
      .orderBy("label")
  }

  /** Unigram-LM surprisal scoring — the CCNet-style perplexity filter
    * with the external KenLM replaced by a self-trained add-one unigram
    * model (the signal degrades gracefully: a 1-gram LM still separates
    * gibberish/rare-token docs from fluent ones, and needs no model
    * artifact shipped to executors). Per word: surprisal
    * -ln((c_w + 1) / (N + V)) over corpus word count c_w, total tokens N,
    * vocab size V; per doc: the sum and the per-word mean (nats/word —
    * the log of the doc's unigram perplexity).
    *
    * Determinism: each surprisal is ONE double expression from exact
    * integer counts, rounded to 6 and cast DECIMAL(18,6) (the BM25
    * convention) so the per-doc sum is exact and order-free; the mean is
    * the double cast of that exact sum divided by an exact count. N and
    * V are data-derived by both engines (ORACLE.md).
    *
    * Plan shape: one token-proportional shuffle builds the lexicon, a
    * second joins it back (the BM25 postings shape — at 100 TB you'd
    * serve both from the same session-cached postings index); the (N, V)
    * scalar pair broadcasts. */
  def unigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(col("doc_id"), explode(col("ws")).as("w"))
    val lex = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val stats = lex.agg(sum("c").as("n"), count(lit(1)).as("v"))
    toks.join(lex, "w")
      .crossJoin(broadcast(stats))
      .withColumn("s", round(-log(
        (col("c") + lit(1.0)) / (col("n") + col("v")).cast("double")), 6)
        .cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("s").as("nll"))
      .select(col("doc_id"), col("n_words"),
        col("nll").cast("double").as("nll_sum"),
        (col("nll").cast("double") / col("n_words")).as("nll_avg"))
      .orderBy("doc_id")
  }

  /** Count-Min heavy hitters — the frequency twin of the HLL panel,
    * completing the mergeable-sketch family: a d x w counter grid
    * (md5-derived row hashes, cell = how many corpus tokens land
    * there), point estimate = min over the d cells a word hashes to.
    * The defining property — estimate >= true count, overcount bounded
    * by collisions — is emitted beside the exact count so the panel
    * measures its own sketch error, exactly like hllGramCardinality.
    *
    * Why it matters at 100 TB: the cell table is d x w COUNTERS
    * regardless of corpus size (map-side partial aggregation does all
    * the work; the shuffle carries <= d*w rows per partition), where an
    * exact word count shuffles the whole vocabulary. The exact side
    * here is the fixture's ground truth; a real deployment keeps only
    * the grid. Everything is md5 arithmetic — deterministic, oracle-
    * mirrorable, no sampling. */
  def cmsHeavyHitters(spark: SparkSession, dir: String, d: Int = 4,
                      w: Int = 256, k: Int = 20): DataFrame = {
    require(d >= 1 && w >= 1, s"d=$d, w=$w must be positive")
    val toks = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(explode(col("ws")).as("w"))
    val hashes = cmsCellColumns(col("w"), d, w)
    val cells = toks.select(posexplode(hashes).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cell"))
    val top = toks.groupBy("w").agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("w")).limit(k)
    top.select(col("w"), col("exact_count"),
        posexplode(hashes).as(Seq("row", "bucket")))
      .join(broadcast(cells), Seq("row", "bucket"))
      .groupBy("w", "exact_count")
      .agg(min("cell").as("cms_estimate"))
      .select(col("w").as("word"), col("exact_count"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_count")).as("overcount"))
      .orderBy(col("exact_count").desc, col("word"))
  }

  /** Distinct-n diversity panel — the corpus-level generation-quality
    * metric (distinct-1/2/3 of Li et al.): per source and n, the share
    * of n-gram OCCURRENCES that are distinct types. A templated or
    * self-repetitive source scores low long before per-doc repetition
    * flags fire; the three n's separate vocabulary poverty (n=1) from
    * phrase-level boilerplate (n=2,3). One gram explode + count pair
    * per n (the postings-aggregate class), ratio portable-round-6 (an
    * integer ratio — the guaranteed-tie class). */
  def distinctNgramDiversity(spark: SparkSession, dir: String,
                             ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n list: $ns")
    val base = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .filter(size(col("ws")) > 0)
    ns.map { n =>
      base
        .select(col("source"),
          explode(TextDedup.ngramsOf(col("ws"), n)).as("gram"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          count_distinct(col("gram")).as("n_distinct"))
        .withColumn("n", lit(n))
    }.reduce(_ unionByName _)
      .withColumn("distinct_share",
        floor(col("n_distinct").cast("double") / col("n_total") * lit(1.0e6)
          + lit(0.5)) / lit(1.0e6))
      .select(col("source"), col("n"), col("n_total"), col("n_distinct"),
        col("distinct_share"))
      .orderBy("source", "n")
  }

  /** PMI collocation mining — the top-k word pairs whose adjacency is
    * most ABOVE chance (pointwise mutual information, the classic
    * phrase/multi-word-expression detector): pmi = ln(p(ab) / (p(a)
    * p(b))) computed as one ln over an integer-ratio expression both
    * engines evaluate with the identical IEEE sequence, portable-
    * round-6 because it feeds the top-k ORDERING; a minimum pair count
    * keeps one-off juxtapositions of two rare words from dominating
    * (the standard PMI sparsity fix). Scale shape: the bigram and
    * unigram counts are the postings-aggregate class, the two totals
    * broadcast, and the top-k lowers to TakeOrderedAndProject. */
  def pmiCollocations(spark: SparkSession, dir: String, k: Int = 20,
                      minCount: Int = 5): DataFrame = {
    val toks = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .filter(size(col("ws")) > 0)
      .select(explode(expr(
        "transform(sequence(1, size(ws)), i -> " +
          "struct(ws[i-1] AS w, CASE WHEN i >= 2 THEN ws[i-2] END AS pw))")).as("t"))
      .select(col("t.w").as("w"), col("t.pw").as("pw"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").as("n_tokens"))
    val bg = toks.filter(col("pw").isNotNull)
      .groupBy("pw", "w").agg(count(lit(1)).as("cbg"))
    val btot = bg.agg(sum("cbg").as("n_bigrams"))
    bg.filter(col("cbg") >= minCount)
      .join(uni.select(col("w").as("pw"), col("c").as("ca")), "pw")
      .join(uni.select(col("w"), col("c").as("cb")), "w")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
      .withColumn("pmi", round6Portable(log(
        (col("cbg").cast("double") * col("n_tokens") * col("n_tokens")) /
          (col("n_bigrams").cast("double") * col("ca") * col("cb")))))
      .select(col("pw").as("word_a"), col("w").as("word_b"),
        col("cbg").as("n_pair"), col("pmi"))
      .orderBy(col("pmi").desc, col("word_a"), col("word_b"))
      .limit(k)
  }

  /** The d per-row CMS bucket hashes of a word column (shared by the
    * batch panel above and the streaming cell maintenance in
    * `streaming.Sketches` — both sides MUST hash identically or a
    * stream-built grid answers garbage for batch probes). */
  private[graft] def cmsCellColumns(wCol: Column, d: Int, w: Int): Column =
    array((0 until d).map(i =>
      pmod(md5Long(concat(lit(s"cm$i:"), wCol)), lit(w.toLong))): _*)

  /** TF-IDF keyword extraction — the top-k CHARACTERISTIC words per
    * document (classic tf x ln(N/df)), the lightweight tagging/topic
    * signal next to the BM25 index (same statistic family, per-doc
    * face instead of per-query). Corpus statistics (document frequency,
    * doc count) are computed over the WHOLE corpus; the query face
    * emits every `emitEvery`-th doc so the dump stays bounded while the
    * heavy stages stay full-width.
    *
    * Determinism: idf = round6-portable(ln(N/df)) as DECIMAL(18,6)
    * (it feeds the top-k ORDERING, so the portable round — see
    * round6Portable's note), score = tf x idf6 as an EXACT decimal
    * product; rank ties break on the word. Scale shape: one token
    * explode, two count aggregates, one vocab-keyed equality join
    * (the postings-join class), and a per-doc window — no stage sees
    * more than (corpus tokens, vocab) and nothing is driver-sized. */
  def tfidfKeywords(spark: SparkSession, dir: String, k: Int = 3,
                    emitEvery: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
    val wnd = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("w"))
    tf.join(dfreq, "w")
      .crossJoin(broadcast(nDocs))
      .filter(col("doc_id") % emitEvery === 0)
      .withColumn("idf6",
        round6Portable(log(col("n_docs").cast("double") / col("df")))
          .cast("decimal(18,6)"))
      .withColumn("score",
        (col("tf").cast("decimal(12,0)") * col("idf6")).cast("decimal(18,6)"))
      .withColumn("rk", row_number().over(wnd))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("w").as("word"),
        col("score").cast("double").as("score"))
      .orderBy("doc_id", "rk")
  }

  /** Interpolated BIGRAM-LM surprisal — the full CCNet-style perplexity
    * signal (unigramSurprisal is its backoff floor): per token,
    * p = lambda * c(prev,w)/c(prev,*) + (1-lambda) * (c(w)+1)/(N+V),
    * the standard Jelinek-Mercer interpolation of the MLE bigram with
    * the add-one unigram; a document's FIRST token has no history and
    * scores on the unigram alone. Trained on the corpus itself (no
    * external LM artifact), like every model in this engine. Repetitive
    * continuation (boilerplate, templated text) scores low; novel word
    * orderings score high even when every unigram is common — the
    * dimension the unigram filter cannot see.
    *
    * Determinism: per-token surprisal is round(-ln p, 6) as
    * DECIMAL(18,6), doc totals exact order-free decimal sums (the
    * text_perplexity recipe); both engines derive p with the identical
    * expression tree. The default lambda is DYADIC (0.75, exact in
    * IEEE-754 and in decimal) so 1-lambda is exact on both engines —
    * 0.7 would make 1-lambda 0.30000000000000004 in doubles but 0.3 in
    * DuckDB's decimal literal, the same rounding-boundary trap the
    * leakage split's dyadic thresholds document. Scale shape: one token
    * explode, two count aggregates (unigram + bigram), one (prev,w)
    * equality join — the postings-join class, never pairwise. */
  def bigramSurprisal(spark: SparkSession, dir: String,
                      lambda: Double = 0.75): DataFrame = {
    val toks = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws)), i -> " +
          "struct(ws[i-1] AS w, CASE WHEN i >= 2 THEN ws[i-2] END AS pw))")).as("t"))
      .select(col("doc_id"), col("t.w").as("w"), col("t.pw").as("pw"))
    val lex = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val stats = lex.agg(sum("c").as("n"), count(lit(1)).as("v"))
    val bg = toks.filter(col("pw").isNotNull)
      .groupBy("pw", "w").agg(count(lit(1)).as("cbg"))
    val ctx = bg.groupBy("pw").agg(sum("cbg").as("cctx"))
    val pUni = (col("c").cast("double") + lit(1.0)) /
      (col("n") + col("v")).cast("double")
    val pBg = col("cbg").cast("double") / col("cctx").cast("double")
    toks
      .join(lex, "w")
      .join(bg, Seq("pw", "w"), "left")
      .join(ctx, Seq("pw"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("p",
        when(col("pw").isNull, pUni)
          .otherwise(lit(lambda) * pBg + lit(1.0 - lambda) * pUni))
      .withColumn("s", round(-log(col("p")), 6).cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("s").as("nll"))
      .select(col("doc_id"), col("n_words"),
        col("nll").cast("double").as("nll_sum"),
        (col("nll").cast("double") / col("n_words")).as("nll_avg"))
      .orderBy("doc_id")
  }

  /** Gopher-style RULE filter (Rae et al. 2021's published heuristics,
    * the standard pre-model curation gate): per document, each named
    * rule's outcome as 0/1 plus the conjunction —
    *   r_word_count: 50 <= n_words <= 100000;
    *   r_word_len:   3 <= mean word length <= 10;
    *   r_symbol:     punctuation-to-char ratio <= 0.1;
    *   r_stopwords:  >= 2 DISTINCT stopwords present;
    *   r_repetition: top-bigram fraction <= 0.18.
    * Emitting per-rule flags (not just the verdict) is what a dataset
    * card needs: WHICH rule kills a doc is the actionable signal. All
    * comparisons are on the same rounded doubles both engines compute;
    * zero-word docs fail the null-comparison rules (CASE NULL -> 0) on
    * both engines identically. One narrow scan + the bigram aggregate;
    * no joins beyond the per-doc repetition leg. */
  def qualityRules(spark: SparkSession, dir: String): DataFrame = {
    val q = withQuality(docs(spark, dir))
      // popcount of the fused stop-mask == the distinct-stopword count
      // the array_distinct formulation computed (OpsSpec-pinned)
      .withColumn("n_stop_distinct",
        bit_count(graft.plans.GraftExtensions.textStat(
          col("text"), graft.plans.TextStatsExpr.StopMask)).cast("long"))
    val rep = repetitionOf(docs(spark, dir)).select("doc_id", "top_bigram_frac")
    def flag(c: Column) = when(c, lit(1L)).otherwise(lit(0L))
    val rWc = col("n_words") >= 50 && col("n_words") <= 100000
    val rWl = col("avg_word_len") >= 3.0 && col("avg_word_len") <= 10.0
    val rSym = col("punct_ratio") <= 0.1
    val rSw = col("n_stop_distinct") >= 2
    val rRep = col("top_bigram_frac") <= 0.18
    q.join(rep, "doc_id")
      .select(col("doc_id"), col("n_words"),
        flag(rWc).as("r_word_count"),
        flag(rWl).as("r_word_len"),
        flag(rSym).as("r_symbol"),
        flag(rSw).as("r_stopwords"),
        flag(rRep).as("r_repetition"),
        flag(rWc && rWl && rSym && rSw && rRep).as("pass"))
      .orderBy("doc_id")
  }

  /** The DATASET CARD panel — the per-source summary every corpus
    * release publishes, computed as ONE composed plan over the shared
    * session caches: doc/word counts, language mix (n distinct
    * predicted langs + the modal one), near-dup exposure (docs in a
    * minhash cluster of size > 1 — the cached cluster table), benchmark
    * contamination (the banded flagger's distinct corpus docs), and
    * mean quality (exact decimal sum / count, the cross_modal
    * convention — a double sum would be order-dependent across
    * engines).
    *
    * Scale shape: every leg is an existing operator's cached table or a
    * per-doc narrow scan; the card itself adds two source-keyed
    * aggregates and a source-partitioned top-1 window (source count is
    * dataset-card-sized, tens). Nothing here is new corpus work. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val q = withQuality(docs(spark, dir))
      .select(col("doc_id"), col("source"), col("n_words"), col("quality_score"))
    val langs = langId(spark, dir).select(col("doc_id"), col("predicted_lang"))
    val dups = TextDedup.minhashClusters(spark, dir)
      .select(col("doc_id"), (col("cluster_size") > 1).as("is_dup"))
    val cont = TextDedup.decontamination(spark, dir)
      .select("doc_id").distinct().withColumn("is_cont", lit(true))
    val perDoc = q.join(langs, "doc_id").join(dups, "doc_id")
      .join(cont, Seq("doc_id"), "left")
    val card = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_words").as("n_words"),
      countDistinct("predicted_lang").as("n_langs"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("dup_docs"),
      sum(when(col("is_cont"), 1L).otherwise(0L)).as("contaminated_docs"),
      round(sum(col("quality_score").cast("decimal(14,4)")).cast("double") /
        count(lit(1)), 6).as("avg_quality"))
    val lc = perDoc.groupBy("source", "predicted_lang").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("source")
      .orderBy(col("n").desc, col("predicted_lang").asc)
    val top = lc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("source"), col("predicted_lang").as("top_lang"))
    card.join(top, "source")
      .select("source", "n_docs", "n_words", "n_langs", "top_lang",
        "dup_docs", "contaminated_docs", "avg_quality")
      .orderBy("source")
  }

  /** LENGTH-BUCKET packing panel — the padding-waste accounting behind
    * sequence bucketing: documents group into power-of-two word-length
    * buckets (a training batch pads every sequence to its bucket size),
    * and the panel reports per-bucket doc counts, real word mass, and
    * the padding waste share a bucketed batcher would pay. High waste
    * in a bucket says to split it; the panel is one narrow projection
    * + a ≤log₂(maxlen)-row aggregate. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bucket = smallest power of two >= n_words (ceil via bit length)
    val n = size(words(col("text"))).cast("long")
    val bucket = (1 to 24).foldLeft(lit(1L)) { (acc, k) =>
      when(col("n_words") > lit(1L << (k - 1)), lit(1L << k)).otherwise(acc)
    }
    docs(spark, dir)
      .select(col("doc_id"), n.as("n_words"))
      .filter(col("n_words") > 0)
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("word_mass"))
      .withColumn("padded_mass", col("bucket") * col("n_docs"))
      .withColumn("waste_share",
        round((col("padded_mass") - col("word_mass")) / col("padded_mass"), 6))
      .select("bucket", "n_docs", "word_mass", "padded_mass", "waste_share")
      .orderBy("bucket")
  }

  /** CHARSET health stats per source — the mojibake/control-character
    * cleaning signal: share of non-ASCII characters, count of control
    * characters (tab/newline excluded), and U+FFFD replacement-char
    * occurrences (the classic double-decode fingerprint). Pure
    * regex/length arithmetic, embarrassingly parallel, round-4 shares. */
  def charsetStats(spark: SparkSession, dir: String): DataFrame = {
    // fused byte-pass stats (plans/TextStatsExpr NonAscii/ControlChars/
    // ReplacementChars — r17 second fuse wave: the three regexp_replace
    // passes were 73 s of the sf100 run). Pure byte algebra on the
    // UTF-8 encoding, exact for arbitrary input (no ASCII gate needed);
    // pinned against the regex originals in GraftExtensionsSpec, and
    // the DuckDB oracle keeps the independent regex formulation.
    import graft.plans.{GraftExtensions => gx, TextStatsExpr => ts}
    docs(spark, dir)
      .select(col("source"),
        length(col("text")).cast("long").as("n_chars"),
        gx.textStat(col("text"), ts.NonAscii).as("non_ascii"),
        gx.textStat(col("text"), ts.ControlChars).as("control_chars"),
        gx.textStat(col("text"), ts.ReplacementChars).as("replacement_chars"))
      .groupBy("source")
      .agg(sum("n_chars").as("n_chars"),
        sum("non_ascii").as("non_ascii"),
        sum("control_chars").as("control_chars"),
        sum("replacement_chars").as("replacement_chars"))
      .withColumn("non_ascii_share",
        round(col("non_ascii").cast("double") / col("n_chars"), 4))
      .select("source", "n_chars", "non_ascii", "control_chars",
        "replacement_chars", "non_ascii_share")
      .orderBy("source")
  }

  /** Difficulty-proportional DOMAIN REWEIGHTING (DoReMi-lite, after
    * Xie et al. 2023's domain-reweighting idea with a deterministic
    * surprisal proxy instead of a trained reference model): a source's
    * mixture weight is its mean per-doc unigram surprisal normalized
    * over sources — harder (more novel) domains get proportionally more
    * of the training budget, templated ones less. Emits the weight and
    * the integer quota a 1000-doc budget would allocate (floor, so
    * quotas never oversubscribe).
    *
    * Determinism: per-doc difficulty is round-6 decimal (the curriculum
    * recipe); the per-source mean re-rounds to 6; the cross-source
    * total is an exact ≤|sources|-term decimal sum, so the final
    * weight division is one IEEE op on identical inputs. */
  def domainReweight(spark: SparkSession, dir: String,
                     budget: Int = 1000): DataFrame = {
    val diff = unigramSurprisal(spark, dir)
      .select(col("doc_id"),
        round6Portable(col("nll_avg")).cast("decimal(18,6)").as("d6"))
    val perSource = docs(spark, dir).select("doc_id", "source")
      .join(diff, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("d6").as("sd"))
      .withColumn("mean6",
        round6Portable(col("sd").cast("double") / col("n_docs"))
          .cast("decimal(18,6)"))
    val total = perSource.agg(sum("mean6").as("t6"))
    perSource.crossJoin(broadcast(total))
      .withColumn("weight",
        round(col("mean6").cast("double") / col("t6").cast("double"), 6))
      .withColumn("quota",
        floor(col("mean6").cast("double") / col("t6").cast("double")
          * budget).cast("long"))
      .select(col("source"), col("n_docs"),
        col("mean6").cast("double").as("mean_difficulty"),
        col("weight"), col("quota"))
      .orderBy("source")
  }

  /** Corpus DRIFT monitor — symmetric pair of smoothed KL divergences
    * between the token distributions of the two corpus halves
    * (doc_id parity = the stand-in for consecutive crawl snapshots;
    * a production deployment passes two real snapshot dirs through the
    * same shape). Add-one smoothing over the union vocabulary keeps
    * every term finite; each p·ln(p/q) term is round-6 DECIMAL(18,6)
    * so the per-source sums are exact and order-free. Rising KL across
    * snapshots is the retrain-the-filters signal. One token count +
    * one vocab-sized pass per source — linear, no pairwise anything. */
  def corpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val cnt = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(col("source"), (col("doc_id") % 2).as("half"),
        explode(col("ws")).as("w"))
      .groupBy("source", "w")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("cb"))
    val tot = cnt.groupBy("source").agg(
      sum("ca").as("na"), sum("cb").as("nb"), count(lit(1)).as("v"))
    cnt.join(tot, "source")
      .withColumn("pa", (col("ca") + lit(1.0)) / (col("na") + col("v")))
      .withColumn("pb", (col("cb") + lit(1.0)) / (col("nb") + col("v")))
      .withColumn("tab",
        round(col("pa") * log(col("pa") / col("pb")), 6).cast("decimal(18,6)"))
      .withColumn("tba",
        round(col("pb") * log(col("pb") / col("pa")), 6).cast("decimal(18,6)"))
      .groupBy("source")
      .agg(min("v").as("vocab"),
        sum("tab").as("ka"), sum("tba").as("kb"))
      .select(col("source"), col("vocab"),
        col("ka").cast("double").as("kl_ab"),
        col("kb").cast("double").as("kl_ba"))
      .orderBy("source")
  }

  /** Rolling drift by corpus DECILE — WHERE the distribution shifted,
    * not just whether ([[corpusDrift]] answers the halves question;
    * this one localizes it): KL(decile || whole corpus) for ten
    * doc_id-range slices (arrival order; a production run slices on
    * ingest batch). Deliberately arithmetic bucketing, NOT a global
    * ntile — the curriculum lesson: a global rank window funnels the
    * corpus through one partition. The full union vocabulary
    * contributes to every decile (a missing word's add-one mass is
    * part of the divergence), so the term table is 10 x vocab — the
    * postings class; terms are round-6 DECIMAL so decile sums are
    * exact and order-free. A decile whose KL spikes is the batch to
    * quarantine. */
  def corpusDriftDeciles(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(col("doc_id"), explode(col("ws")).as("w"))
    val mx = toks.agg(max("doc_id").as("mx"))
    val t = toks.crossJoin(broadcast(mx))
      .withColumn("dec", expr("(doc_id * 10) div (mx + 1)"))
    val cw = t.groupBy("dec", "w").agg(count(lit(1)).as("cdw"))
    val gw = t.groupBy("w").agg(count(lit(1)).as("cw"))
    val nd = cw.groupBy("dec").agg(sum("cdw").as("ndec"))
    val vn = gw.agg(count(lit(1)).as("v"), sum("cw").as("n"))
    val decs = spark.range(10).select(col("id").as("dec"))
    gw.crossJoin(decs)
      .join(cw, Seq("dec", "w"), "left")
      .withColumn("cdw", coalesce(col("cdw"), lit(0L)))
      .join(nd, "dec")
      .crossJoin(broadcast(vn))
      .withColumn("pd", (col("cdw") + lit(1.0)) / (col("ndec") + col("v")))
      .withColumn("pc", (col("cw") + lit(1.0)) / (col("n") + col("v")))
      .withColumn("t6",
        round(col("pd") * log(col("pd") / col("pc")), 6).cast("decimal(18,6)"))
      .groupBy("dec")
      .agg(min("ndec").as("n_tokens"), sum("t6").as("kl"))
      .select(col("dec"), col("n_tokens"), col("kl").cast("double").as("kl_to_corpus"))
      .orderBy("dec")
  }

  /** Tokenizer FERTILITY per source — BPE tokens emitted per word, the
    * standard tokenizer-evaluation metric (a fertility far above ~1.3
    * on a source means the vocabulary serves it badly and its effective
    * context shrinks). Rides the session-cached/persisted 10-merge
    * tokenizer ([[bpeTrained]]): per word, weight = |symbols after
    * merges|; per source, fertility = Σweight / words. The vocab join
    * is vocab-sized (never corpus²); the corpus side is one token
    * explode — the token_counts_bpe plan regrouped by source. */
  def bpeFertility(spark: SparkSession, dir: String,
                   numMerges: Int = 10): DataFrame = {
    val (_, vocab) = bpeTrained(spark, dir, numMerges)
    val wt = vocab.select(col("word"), size(col("syms")).cast("long").as("wt"))
    docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(col("source"), explode(col("ws")).as("word"))
      .join(wt, "word")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum("wt").as("n_tokens"))
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 6))
      .select("source", "n_words", "n_tokens", "fertility")
      .orderBy("source")
  }

  /** Curriculum assignment: every document gets a difficulty PHASE
    * (z-score band of its unigram surprisal: easy < mean−σ < mid <
    * mean < hard < mean+σ < hardest) and a deterministic md5 SHARD
    * within the phase — the easy→hard ordered-training layout
    * (curriculum learning, Bengio et al. 2009) as a data artifact.
    *
    * Deliberately NOT rank-based: a global ntile/row_number window
    * would funnel the whole corpus through one partition — the exact
    * shape this engine bans at scale. Z-score banding needs only ONE
    * tiny aggregate (count + two exact decimal sums, broadcast back),
    * keeps the per-doc pass embarrassingly parallel, and is
    * deterministic: the per-doc difficulty is round-6 decimal, the
    * mean/E[x²] are exact decimal sums cast to double, and both
    * engines build the band thresholds from the same IEEE ops. Phase
    * populations are data-shaped (not forced quarters) — that is the
    * honest trade for scale, and the shard key (md5) balances within
    * phases regardless. */
  def curriculumAssign(spark: SparkSession, dir: String,
                       nShards: Int = 16): DataFrame =
    zBandAssign(unigramSurprisal(spark, dir), nShards)

  /** PORTABLE half-up round-6 for doubles: floor(x·10⁶ + 0.5)/10⁶ —
    * three IEEE ops that land on identical bits in Spark and DuckDB.
    * Needed where the rounded value feeds a COMPARISON: `nll_avg` is a
    * 6-dp decimal sum over a small integer, so its 7th digit is OFTEN
    * exactly 5 (any n_words ∈ {2,4,5,…}), and on those ties Spark's
    * HALF_UP-on-shortest-repr and DuckDB's multiply-based round()
    * disagree by 1e-6 — enough to flip a z-band phase (found by the
    * sf0.1 gate; sf0.01 survived by luck). Positive inputs only. */
  private[ops] def round6Portable(c: Column): Column =
    floor(c * lit(1.0e6) + lit(0.5)) / lit(1.0e6)

  /** The z-band + shard stage of [[curriculumAssign]], factored so a
    * pipeline can band a RESTRICTED difficulty table (e.g. the training
    * manifest's survivors) with the band statistics computed over
    * exactly the docs being banded. Input needs (doc_id, nll_avg). */
  private[ops] def zBandAssign(sur: DataFrame, nShards: Int): DataFrame = {
    val diff = sur
      .select(col("doc_id"),
        round6Portable(col("nll_avg")).cast("decimal(18,6)").as("d6"))
    val stats = diff.agg(
      count(lit(1)).as("n"),
      sum("d6").as("sd"),
      sum(col("d6") * col("d6")).as("sd2"))
    diff.crossJoin(broadcast(stats))
      .withColumn("mean", col("sd").cast("double") / col("n"))
      .withColumn("ex2", col("sd2").cast("double") / col("n"))
      .withColumn("sdev", sqrt(col("ex2") - col("mean") * col("mean")))
      .withColumn("difficulty", col("d6").cast("double"))
      .withColumn("phase",
        when(col("difficulty") < col("mean") - col("sdev"), 1)
          .when(col("difficulty") < col("mean"), 2)
          .when(col("difficulty") < col("mean") + col("sdev"), 3)
          .otherwise(4))
      .withColumn("shard",
        (md5Long(concat_ws(":", lit("cur"), col("doc_id"))) % nShards)
          .cast("int"))
      .select("doc_id", "difficulty", "phase", "shard")
      .orderBy("doc_id")
  }

  /** Shannon token entropy per source — the vocabulary-diversity panel
    * next to [[hllGramCardinality]]: low entropy (or a high top-token
    * share) marks templated/boilerplate sources before any pairwise
    * dedup runs. Determinism is the text_perplexity recipe: each
    * −p·ln p term is round-6 DECIMAL(18,6), the per-source total an
    * exact order-free decimal sum. Two aggregations (token counts,
    * per-source rollup) — linear, no joins wider than the vocab. */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cnt = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(col("source"), explode(col("ws")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("source").agg(
      sum("c").as("n"), count(lit(1)).as("vocab"), max("c").as("cmax"))
    val ent = cnt.join(tot, "source")
      .withColumn("term",
        round(-(col("c") / col("n")) * log(col("c") / col("n")), 6)
          .cast("decimal(18,6)"))
      .groupBy("source").agg(sum("term").as("e"))
    ent.join(tot, "source")
      .select(col("source"), col("n").as("n_tokens"), col("vocab"),
        col("e").cast("double").as("entropy_nats"),
        round(col("cmax").cast("double") / col("n"), 6).as("top_share"))
      .orderBy("source")
  }

  /** HyperLogLog distinct-3-gram estimate per source, next to the exact
    * count it approximates — the MERGEABLE-SKETCH cardinality pattern
    * (Flajolet et al. 2007): hash each gram, take register = low 6 hash
    * bits and rho = leading-zero rank of the next 32 bits, keep max(rho)
    * per (source, register), estimate α·m²/Σ2^−M. The whole sketch is
    * ONE aggregation with m = 64 longs of state per source — partial
    * aggregates merge by register max, which is exactly how 1000
    * executors count distinct over 100 TB without shuffling a
    * distinct-key stream (the exact leg here exists to grade the
    * estimate and IS that expensive distinct shuffle).
    *
    * Determinism across engines: 2^−M is computed as 1/(1 << M) — an
    * exact power-of-two double — so Σ is a sum of exact doubles and the
    * final α·m²/Σ is single IEEE ops, bit-identical in Spark and the
    * oracle. The raw estimator needs no small-range correction here:
    * per-source gram cardinality (~1.3k at sf0.01, growing with corpus)
    * sits far above the 2.5·m = 160 correction threshold, so the
    * ln-based branch (whose libm could drift a ulp cross-engine) never
    * enters. α = 0.709, the published m = 64 constant. */
  def hllGramCardinality(spark: SparkSession, dir: String,
                         m: Int = 64, n: Int = 3): DataFrame = {
    val grams = docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .filter(size(col("ws")) > 0)
      .select(col("source"), explode(TextDedup.ngramsOf(col("ws"), n)).as("gram"))
    val registers = hllRegistersOf(grams, m)
    val alpha = 0.709
    // 1/(1 << mj) is an EXACT power-of-two double, and the <= m terms
    // span under 53 bits, so the sum is exact and order-independent —
    // the oracle's Σ lands on the same bits
    val est = registers.groupBy("source")
      .agg(count(lit(1)).as("n_registers"),
        sum(lit(1.0) / expr("shiftleft(cast(1 as bigint), mj)")).as("s_used"))
      .withColumn("est_distinct",
        round(lit(alpha) * lit(m * m) /
          (col("s_used") + (lit(m) - col("n_registers"))), 4))
    val exact = grams.groupBy("source")
      .agg(countDistinct("gram").as("exact_distinct"))
    est.join(exact, "source")
      .select("source", "n_registers", "est_distinct", "exact_distinct")
      .orderBy("source")
  }

  /** The HLL register table of a (source, gram) frame: register = low
    * log2(m) md5 bits, rho = leading-zero rank of the next 32 bits,
    * max per (source, register). Factored so the STREAMING face
    * (`streaming.Sketches.hllRegisters`) maintains the identical
    * registers as bounded aggregation state — max is the mergeable-
    * sketch update, exactly like the CMS grid's count. */
  private[graft] def hllRegistersOf(grams: DataFrame, m: Int): DataFrame = {
    require(Integer.bitCount(m) == 1, s"m=$m must be a power of two")
    val logM = Integer.numberOfTrailingZeros(m)
    val h = md5Long(concat(lit("hll:"), col("gram")))
    // bit surgery stays in LONG space (Column./ is double division and
    // would lose bits past 2^53): register = low log2(m) bits, r2 = the
    // next 32 bits
    val r2 = shiftright(h, logM) % lit(1L << 32)
    // bit length of the 32-bit slice: the largest k with r2 >= 2^(k-1)
    val bitlen = (1 to 32).foldLeft(lit(0)) { (acc, k) =>
      when(r2 >= lit(1L << (k - 1)), lit(k)).otherwise(acc)
    }
    grams
      .select(col("source"), (h % m).as("register"), (lit(33) - bitlen).as("rho"))
      .groupBy("source", "register").agg(max("rho").as("mj"))
  }

  /** Document fingerprints: full-content md5, a 60-bit integer fingerprint,
    * and the min word-3-gram shingle hash (winnowing-lite — equal for any
    * two docs sharing their rarest shingle window). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("ws", words(col("text")))
      .select(
        col("doc_id"),
        md5(lower(col("text"))).as("fp_md5"),
        md5Long(lower(col("text"))).as("fp_int"),
        array_min(transform(shinglesOf(col("ws")), s => md5Long(s) % P)).as("min_shingle_hash"))
      .orderBy("doc_id")
}
