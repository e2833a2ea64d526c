package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextHashing.words

/** Keyword relevance ranking (BM25) and hybrid text+vector retrieval
  * (reciprocal-rank fusion) over the documents/embeddings tables — the
  * retrieval surface a training-data pipeline needs for "find documents
  * like this one" curation, decontamination triage, and quality-weighted
  * sampling.
  *
  * Robertson/Spärck Jones BM25 (the Okapi formulation, public-domain
  * formula): score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
  * with the always-positive idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Architecture is inverted-index-shaped, not scan-shaped:
  *  - `postings` (doc_id, term, tf, dl) is the inverted index, built once
  *    per (session, dir) and session-cached; `buildTextIndex` persists it
  *    partitioned by a term-hash bucket, so a probe's term list folds to
  *    a literal bucket set and the fetch is static partition pruning —
  *    the posting-list read of a real inverted index, not a corpus scan.
  *  - `dfTable` (term, df) is the index's lexicon — tiny (vocabulary-sized),
  *    always broadcast.
  *  - A query probes the index with an equality filter/join on its terms;
  *    cost is the touched posting lists, the single shuffle is the per-doc
  *    score sum (groupBy doc_id), and the top-k is a TakeOrderedAndProject.
  *
  * Determinism across engines (the DuckDB oracle): each per-(doc, term)
  * contribution is rounded to 6 decimals and cast to DECIMAL(18,6) BEFORE
  * the sum, so the aggregation is exact and addition-order-free — a double
  * sum's value would depend on shuffle arrival order. The final score is
  * the decimal sum cast back to double.
  */
object TextRanking {

  val K1 = 1.2
  val B = 0.75
  /** The standard RRF dampening constant (Cormack et al.). */
  val RrfK = 60

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Ceiling for the IN-SESSION postings cache, as estimated cache bytes
    * (session conf `graft.bm25.maxSessionCacheBytes`; default 16 GiB —
    * comfortable on the 128 GiB harness box, and guaranteed to trip long
    * before a 100 TB corpus). The estimate is metadata-only:
    * `PostingsBytesPerDocByte` x the on-disk parquet bytes of
    * documents.parquet (tokenizing explodes each document into one row
    * per term occurrence, and parquet text compresses a few-fold — 8x
    * decompressed-and-exploded is deliberately pessimistic; the gate
    * exists to stop corpus-scale pinning, not to tune within 2x). */
  val MaxSessionCacheBytesConf = "graft.bm25.maxSessionCacheBytes"
  val DefaultMaxSessionCacheBytes: Long = 16L * 1024 * 1024 * 1024
  val PostingsBytesPerDocByte = 8L

  private def sessionCacheFits(spark: SparkSession, dir: String): Boolean = {
    val bound = spark.conf.getOption(MaxSessionCacheBytesConf)
      .map(_.toLong).getOrElse(DefaultMaxSessionCacheBytes)
    val est = PostingsBytesPerDocByte *
      graft.core.Fs.sizeBytes(spark, s"$dir/documents.parquet")
    est <= bound
  }

  private val overBoundWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** The inverted index: one row per (doc, term) with the term frequency
    * and the document length (denormalized onto every posting so scoring
    * needs no second join). Session-cached while the corpus fits the
    * `MaxSessionCacheBytesConf` estimate; if documents.parquet is
    * rewritten mid-session call
    * `SessionCache.invalidate(spark, "bm25_postings", dir)`.
    *
    * CONTRACT over the bound: the in-session fallback would pin the
    * whole tokenized corpus (O(corpus tokens) rows) in executor
    * memory+disk for the session's lifetime, so past the estimate the
    * probe is served from an UNCACHED plan instead — still correct,
    * but every probe pays a tokenize-and-aggregate scan. That tax is
    * the signal: a corpus past the bound should `buildTextIndex` once
    * and let probes prune the persisted bucket partitions (the warning
    * says exactly that, once per session+dir). */
  def postings(spark: SparkSession, dir: String): DataFrame = {
    def build = {
      val wrd = docs(spark, dir)
        .select(col("doc_id"), words(col("text")).as("ws"))
      val dl = wrd.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
      wrd
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
        .join(dl, "doc_id")
        .select("doc_id", "term", "tf", "dl")
    }
    if (sessionCacheFits(spark, dir))
      graft.core.SessionCache.getOrBuild(spark, "bm25_postings", dir)(build)
    else {
      if (overBoundWarned.add((spark, dir)))
        System.err.println(s"[graft] documents at $dir exceed the in-session " +
          "text-index cache bound: serving UNCACHED postings (every probe " +
          "re-tokenizes). Build the persisted index (buildTextIndex) so " +
          "probes prune its bucket partitions instead.")
      build
    }
  }

  /** The lexicon: document frequency per term. Vocabulary-sized, so the
    * planner broadcasts it wherever it joins. */
  def dfTable(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "bm25_df", dir) {
      postings(spark, dir).groupBy("term").agg(count(lit(1)).as("df"))
    }

  // --- persisted inverted index -----------------------------------------

  /** Postings partitioned by a term-hash bucket: a query's term list
    * folds to a literal bucket set, so the probe is static partition
    * pruning — the posting-list fetch of a real inverted index, same
    * shape as the IVF c_id-partitioned probe. */
  val TextIndexBuckets = 64

  def textPostingsPath(dir: String): String = s"$dir/text_postings.parquet"
  def textLexiconPath(dir: String): String = s"$dir/text_lexicon.parquet"
  /** Corpus scalars (n, avgdl, sdl) — written LAST, doubles as the commit
    * marker (family convention: a crash mid-build leaves no marker and
    * probes fall back to the in-session index). `sdl` (the exact token-sum
    * the avgdl division came from) is what lets an APPEND extend the stats
    * without a corpus rescan. */
  def textStatsPath(dir: String): String = s"$dir/text_stats.parquet"

  /** DELTA postings appended after the base build (`appendToTextIndex`) —
    * partitioned (batch_id, bucket): bucket keeps probe pruning, batch_id
    * makes every append idempotent under crash retry (dynamic overwrite of
    * its own partitions only — the vector index's delta recipe,
    * `Similarity.ivfPqDeltaPath`). */
  def textDeltaPath(dir: String): String = s"$dir/text_postings_delta.parquet"

  /** Per-batch corpus-stats rows (batch_id, n_add, sdl_add) — each row is
    * ITS batch's commit marker, written after the batch's delta postings:
    * probes only see delta batches whose stats row landed, so a crashed
    * append is invisible (and repaired by re-running the same batchId).
    * Unlike the vector delta — where a half-written batch only costs
    * recall — un-counted postings would shift every BM25 score (n, avgdl,
    * df are part of the formula), so visibility must flip atomically with
    * the stats. */
  def textDeltaStatsPath(dir: String): String = s"$dir/text_delta_stats.parquet"

  /** The bucket expression — over a literal term it folds to a constant,
    * which is what makes probe-side partition pruning static. */
  def bucketOf(term: Column): Column = pmod(xxhash64(term), lit(TextIndexBuckets.toLong))

  private def indexReady(spark: SparkSession, dir: String): Boolean =
    graft.core.Fs.exists(spark, textStatsPath(dir)) &&
      graft.core.Fs.exists(spark, textPostingsPath(dir)) &&
      graft.core.Fs.exists(spark, textLexiconPath(dir))

  // explicit schemas for every persisted read: a bootstrapped-empty (or
  // crashed-before-any-partition) dir has nothing to infer from, and
  // partition columns would otherwise come back as int
  private val PostingsSchema = "doc_id LONG, term STRING, tf LONG, dl LONG, bucket LONG"
  private val DeltaSchema = "doc_id LONG, term STRING, tf LONG, dl LONG, batch_id LONG, bucket LONG"
  private val LexiconSchema = "term STRING, df LONG"

  /** Build + persist the inverted index: bucket-partitioned postings
    * first, lexicon next, stats (the marker) last. A rebuild deletes any
    * delta first — the fresh marker must not validate postings appended
    * against the index it replaces. */
  def buildTextIndex(spark: SparkSession, dir: String, at: Option[String] = None): Unit = {
    val target = at.getOrElse(dir)
    graft.core.Fs.delete(spark, textStatsPath(target))
    graft.core.Fs.delete(spark, textDeltaStatsPath(target))
    graft.core.Fs.delete(spark, textDeltaPath(target))
    postings(spark, dir)
      .withColumn("bucket", bucketOf(col("term")))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(textPostingsPath(target))
    dfTable(spark, dir)
      .write.mode("overwrite").parquet(textLexiconPath(target))
    val (n, avgdl) = corpusStats(spark, dir)
    val sdl = docs(spark, dir)
      .select(size(words(col("text"))).cast("long").as("dl"))
      .agg(coalesce(sum("dl"), lit(0L)).as("sdl")).head().getLong(0)
    import spark.implicits._
    Seq((n, avgdl, sdl)).toDF("n", "avgdl", "sdl").coalesce(1)
      .write.mode("overwrite").parquet(textStatsPath(target))
    invalidateTextIndex(spark, target)
  }

  /** Bootstrap an EMPTY appendable index (no corpus scan): zero-row
    * postings + lexicon, a (0, 0.0, 0) stats marker. The streaming
    * curation sink uses this so its very first batch can ride the same
    * `appendToTextIndex` path as every later one — the whole index is
    * then delta until the first compaction folds it down. */
  def initTextIndex(spark: SparkSession, dir: String): Unit = {
    graft.core.Fs.delete(spark, textStatsPath(dir))
    graft.core.Fs.delete(spark, textDeltaStatsPath(dir))
    graft.core.Fs.delete(spark, textDeltaPath(dir))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(PostingsSchema))
    empty.write.mode("overwrite").partitionBy("bucket").parquet(textPostingsPath(dir))
    empty.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(textLexiconPath(dir))
    import spark.implicits._
    Seq((0L, 0.0, 0L)).toDF("n", "avgdl", "sdl").coalesce(1)
      .write.mode("overwrite").parquet(textStatsPath(dir))
    invalidateTextIndex(spark, dir)
  }

  /** Drop the session's view of a (possibly rebuilt) text index. */
  def invalidateTextIndex(spark: SparkSession, dir: String): Unit = {
    statsCache.remove((spark, dir))
    deltaCache.remove((spark, dir))
    graft.core.SessionCache.invalidate(spark, "bm25_postings", dir)
    graft.core.SessionCache.invalidate(spark, "bm25_df", dir)
  }

  // --- incremental append + compaction ----------------------------------

  /** Incrementally index a batch of NEW documents against the PERSISTED
    * text index — the streaming-curation shape: tokenize ONLY the batch,
    * append its postings as (batch_id, bucket)-partitioned delta, and
    * commit by writing the batch's stats row last. Nothing corpus-width
    * runs; cost is O(|batch| tokens). Unlike the vector-index append there
    * is no quantizer to go stale against: BM25 over base ∪ delta is
    * EXACTLY BM25 over the combined corpus (n, avgdl, df all extend by
    * exact integer sums), so append ≡ rebuild score-for-score and
    * compaction is purely a scan-count/layout concern.
    *
    * `newDocs` needs (doc_id, text) — the documents.parquet shape; extra
    * columns are ignored. The caller owns doc_id uniqueness across base +
    * batches (the curation gates guarantee it in the pipeline). Requires a
    * persisted index: the in-session fallback tokenizes `dir`'s documents
    * table, which knows nothing of appended batches. */
  def appendToTextIndex(spark: SparkSession, dir: String,
                        newDocs: DataFrame, batchId: Long): Unit = {
    require(indexReady(spark, dir),
      s"appendToTextIndex needs a persisted text index at $dir — run buildTextIndex first")
    require(spark.read.parquet(textStatsPath(dir)).columns.contains("sdl"),
      s"text index at $dir predates appendable stats (no sdl) — rebuild with buildTextIndex")
    val wrd = newDocs.select(col("doc_id").cast("long").as("doc_id"),
      words(col("text")).as("ws"))
    val dl = wrd.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    wrd.select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .select("doc_id", "term", "tf", "dl")
      .withColumn("batch_id", lit(batchId))
      .withColumn("bucket", bucketOf(col("term")))
      .repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "bucket")
      .parquet(textDeltaPath(dir))
    // the batch's commit marker: its stats row, written LAST
    dl.agg(count(lit(1)).as("n_add"), coalesce(sum("dl"), lit(0L)).as("sdl_add"))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(textDeltaStatsPath(dir))
    invalidateTextIndex(spark, dir)
  }

  /** The COMMITTED delta batches: (batch_id, n_add, sdl_add), smallest
    * first. Batch-count rows collected driver-side (bounded like the
    * replay ids) and memoized per (session, dir). */
  private val deltaCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), Seq[(Long, Long, Long)]]()

  private def committedDelta(spark: SparkSession, dir: String): Seq[(Long, Long, Long)] = {
    graft.core.SessionCache.watch(spark)
    deltaCache.computeIfAbsent((spark, dir), { _ =>
      if (!graft.core.Fs.exists(spark, textDeltaStatsPath(dir))) Seq.empty
      // explicit schema, twice over: batch_id is a partition column
      // (directory-name inference would yield int), and a stats dir whose
      // ONLY batch crashed pre-commit has no partitions to infer from —
      // that must read as "no committed batches", not an inference error
      else spark.read.schema("n_add LONG, sdl_add LONG, batch_id LONG")
        .parquet(textDeltaStatsPath(dir))
        .select("batch_id", "n_add", "sdl_add").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    })
  }

  /** Delta postings restricted to COMMITTED batches — the batch_id filter
    * is a literal IN over a partition column, so uncommitted (crashed)
    * batches are pruned, not scanned. None when no batch has committed. */
  private def committedDeltaPostings(spark: SparkSession, dir: String): Option[DataFrame] = {
    val ids = committedDelta(spark, dir).map(_._1)
    if (ids.isEmpty) None
    else Some(spark.read.schema(DeltaSchema).parquet(textDeltaPath(dir))
      .filter(col("batch_id").isin(ids: _*)))
  }

  /** Fold the delta back into the base — one bucket-partitioned postings
    * table and one lexicon per probe again, no retokenization (the delta
    * rows ARE the postings; compaction is a pure relayout). Marker
    * discipline, not renames-as-atomicity: staged writes first, the stats
    * marker comes DOWN (readers fall back to the in-session index), the
    * base swaps, the folded delta dies, stats are rewritten LAST. A crash
    * leaves either the old complete index or no marker — never a marker
    * over a half-merged index.
    *
    * `keepRecent = 0` (maintenance shape): fold EVERY committed batch and
    * delete the delta dirs outright — uncommitted (crashed) batches die
    * with them; they were never visible.
    *
    * `keepRecent > 0` (the in-pipeline shape, compactSink's recipe): fold
    * all but the newest `keepRecent` committed batches, deleting only the
    * folded batches' partitions. The kept batches stay replayable — a
    * crash-replayed batch dynamic-overwrites its own still-standing delta
    * partitions instead of double-appending rows a fold already moved
    * into the base. Uncommitted partitions are left untouched too (their
    * batch may be mid-flight). */
  def compactTextIndex(spark: SparkSession, dir: String, keepRecent: Int = 0): Unit = {
    if (!graft.core.Fs.exists(spark, textDeltaPath(dir))) return // nothing staged
    require(indexReady(spark, dir),
      s"compactTextIndex needs a complete persisted text index at $dir")
    val delta = committedDelta(spark, dir) // batch_id ascending
    val fold = delta.dropRight(math.max(keepRecent, 0))
    if (fold.isEmpty && keepRecent > 0) return // nothing old enough to fold
    val foldIds = fold.map(_._1)
    // combined stats from the EXACT integer sums (base file + FOLDED
    // batch rows) — never reconstructed from the avgdl double; kept
    // batches keep contributing through their delta stats rows
    val baseRow = spark.read.parquet(textStatsPath(dir)).select("n", "sdl").head()
    val n = baseRow.getLong(0) + fold.map(_._2).sum
    val sdl = baseRow.getLong(1) + fold.map(_._3).sum
    val avgdl = if (n == 0) 0.0 else sdl.toDouble / n
    val basePost = spark.read.schema(PostingsSchema).parquet(textPostingsPath(dir))
      .select("doc_id", "term", "tf", "dl", "bucket")
    val merged =
      if (foldIds.isEmpty) basePost
      else basePost.unionByName(
        spark.read.schema(DeltaSchema).parquet(textDeltaPath(dir))
          .filter(col("batch_id").isin(foldIds: _*))
          .select("doc_id", "term", "tf", "dl", "bucket"))
    val stagingP = s"${textPostingsPath(dir)}.compacting"
    val stagingL = s"${textLexiconPath(dir)}.compacting"
    merged.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(stagingP)
    spark.read.schema(PostingsSchema).parquet(stagingP)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(stagingL)
    graft.core.Fs.delete(spark, textStatsPath(dir)) // marker down
    graft.core.Fs.delete(spark, textPostingsPath(dir))
    graft.core.Fs.rename(spark, stagingP, textPostingsPath(dir))
    graft.core.Fs.delete(spark, textLexiconPath(dir))
    graft.core.Fs.rename(spark, stagingL, textLexiconPath(dir))
    if (keepRecent <= 0) {
      graft.core.Fs.delete(spark, textDeltaPath(dir))
      graft.core.Fs.delete(spark, textDeltaStatsPath(dir))
    } else foldIds.foreach { id =>
      // folded partitions die BEFORE the new marker lands: a crash here
      // means no marker (fallback), never marker + double-counted rows
      graft.core.Fs.delete(spark, s"${textDeltaPath(dir)}/batch_id=$id")
      graft.core.Fs.delete(spark, s"${textDeltaStatsPath(dir)}/batch_id=$id")
    }
    import spark.implicits._
    Seq((n, avgdl, sdl)).toDF("n", "avgdl", "sdl").coalesce(1)
      .write.mode("overwrite").parquet(textStatsPath(dir))
    invalidateTextIndex(spark, dir)
  }

  /** The posting lists for a term set — persisted-first (bucket partition
    * pruning + term filter, base ∪ committed delta with BOTH scans
    * bucket-pruned), else the session index filtered. */
  private def probePostings(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    if (indexReady(spark, dir)) {
      def pruned(df: DataFrame) = df
        .filter(col("bucket").isin(terms.map(t => bucketOf(lit(t))): _*))
        .filter(col("term").isin(terms: _*))
        .select("doc_id", "term", "tf", "dl")
      val base = pruned(spark.read.schema(PostingsSchema).parquet(textPostingsPath(dir)))
      committedDeltaPostings(spark, dir) match {
        case None    => base
        case Some(d) => base.unionByName(pruned(d))
      }
    } else postings(spark, dir).filter(col("term").isin(terms: _*))

  /** The lexicon rows for a term set — persisted-first (tiny scan; with a
    * delta, each term's df extends by its count over the committed delta
    * postings — a bucket-pruned probe-sized aggregation, exact longs). */
  private def probeLexicon(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    if (indexReady(spark, dir)) {
      val base = spark.read.schema(LexiconSchema).parquet(textLexiconPath(dir))
        .filter(col("term").isin(terms: _*))
      committedDeltaPostings(spark, dir) match {
        case None => base
        case Some(d) =>
          val deltaDf = d
            .filter(col("bucket").isin(terms.map(t => bucketOf(lit(t))): _*))
            .filter(col("term").isin(terms: _*))
            .groupBy("term").agg(count(lit(1)).as("df"))
          base.unionByName(deltaDf)
            .groupBy("term").agg(sum("df").cast("long").as("df"))
      }
    } else dfTable(spark, dir).filter(col("term").isin(terms: _*))

  /** (N, avgdl) — two scalars per (session, dir), memoized on the driver
    * (same pattern as Similarity's kind cache). N counts ALL documents,
    * including zero-token ones; avgdl averages over all documents. */
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (Long, Double)]()

  graft.core.SessionCache.onSessionEnd { spark =>
    val it = statsCache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }

  def corpusStats(spark: SparkSession, dir: String): (Long, Double) = {
    graft.core.SessionCache.watch(spark)
    statsCache.computeIfAbsent((spark, dir), { _ =>
      if (graft.core.Fs.exists(spark, textStatsPath(dir))) {
        // persisted-first: doubles round-trip parquet losslessly, so a
        // cold session scores with the building session's exact avgdl
        val delta = committedDelta(spark, dir)
        if (delta.isEmpty) {
          val r = spark.read.parquet(textStatsPath(dir)).select("n", "avgdl").head()
          (r.getLong(0), r.getDouble(1))
        } else {
          // extend by the committed batches' EXACT integer sums — the
          // resulting avgdl is bit-identical to a full-corpus rebuild's
          val r = spark.read.parquet(textStatsPath(dir)).select("n", "sdl").head()
          val n = r.getLong(0) + delta.map(_._2).sum
          val sdl = r.getLong(1) + delta.map(_._3).sum
          (n, if (n == 0) 0.0 else sdl.toDouble / n)
        }
      } else {
        val row = docs(spark, dir)
          .select(size(words(col("text"))).cast("long").as("dl"))
          .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
          .head()
        val n = row.getLong(0)
        (n, row.getLong(1).toDouble / n)
      }
    })
  }

  /** The BM25 per-(doc, term) contribution, rounded and cast to decimal so
    * the downstream sum is exact (see class note). Expects columns tf, dl,
    * df on the input row. */
  private def contribution(n: Long, avgdl: Double): Column = {
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sat = col("tf") * lit(K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl)))
    round(idf * sat, 6).cast("decimal(18,6)")
  }

  /** The append path's ORACLE face: replay `dir`'s documents table as a
    * base build (doc_id % 3 != 0) plus two appended batches (% 3 == 0,
    * split by % 2), with a compaction between them and the second append
    * run twice (crash-retry idempotence inside the oracle-checked path),
    * then serve `bm25TopK` from the combined persisted index. The DuckDB
    * oracle scores the WHOLE documents table directly — hash equality is
    * an engine-independent proof that append+compact ≡ full rebuild,
    * score for score. Scratch index lives in a temp dir, snapshotted out
    * before deletion (the curation-replay recipe). */
  def incrementalBm25Replay(spark: SparkSession, dir: String,
                            terms: Seq[String], k: Int): DataFrame = {
    val all = docs(spark, dir).select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25_inc").toString
    try {
      all.filter(col("doc_id") % 3 =!= 0)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      buildTextIndex(spark, tmp)
      appendToTextIndex(spark, tmp,
        all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0), 1L)
      compactTextIndex(spark, tmp)
      appendToTextIndex(spark, tmp,
        all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0), 2L)
      appendToTextIndex(spark, tmp, // the crash-retry: same batch, same id
        all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0), 2L)
      bm25TopK(spark, tmp, terms, k).localCheckpoint(true)
    } finally deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Top-k documents for one keyword query. The probe is an IN-filter on
    * the postings index (at scale: partition pruning on the term key), the
    * lexicon join broadcasts, and the only shuffle is the per-doc sum. */
  def bm25TopK(spark: SparkSession, dir: String, terms: Seq[String], k: Int): DataFrame = {
    val (n, avgdl) = corpusStats(spark, dir)
    val q = terms.distinct
    probePostings(spark, dir, q)
      .join(broadcast(probeLexicon(spark, dir, q)), "term")
      .select(col("doc_id"), contribution(n, avgdl).as("w"))
      .groupBy("doc_id")
      .agg(sum("w").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-query keyword sets for "more like this doc" retrieval: each query
    * document's `nTerms` highest-tf terms (term-asc tie-break). Derived
    * from the FORWARD table (documents, doc_id filter pushed to the scan)
    * — probing the inverted index by doc_id would scan every posting
    * partition. */
  def queryTermsOf(spark: SparkSession, dir: String,
                   qids: Seq[Long], nTerms: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term").asc)
    docs(spark, dir)
      .filter(col("doc_id").isin(qids: _*))
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nTerms)
      .select(col("doc_id").as("qid"), col("term"))
  }

  /** Multi-query BM25: top-k per query document (query docs excluded from
    * their own result, like the ANN operators). The query-term list is
    * collected (bounded: |qids|·nTerms rows, like the IVF probe's cluster
    * ids) so the postings fetch stays a pruned probe. Returns
    * (qid, doc_id, score, bm_rank). */
  def bm25TopKFor(spark: SparkSession, dir: String, qids: Seq[Long],
                  k: Int, nTerms: Int = 3): DataFrame = {
    val (n, avgdl) = corpusStats(spark, dir)
    val qt = queryTermsOf(spark, dir, qids, nTerms)
    val terms = qt.select("term").distinct().collect().map(_.getString(0)).toSeq
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    probePostings(spark, dir, terms)
      .join(broadcast(qt), "term")
      .filter(col("doc_id") =!= col("qid"))
      .join(broadcast(probeLexicon(spark, dir, terms)), "term")
      .select(col("qid"), col("doc_id"), contribution(n, avgdl).as("w"))
      .groupBy("qid", "doc_id")
      .agg(sum("w").cast("double").as("score"))
      .withColumn("bm_rank", row_number().over(w).cast("long"))
      .filter(col("bm_rank") <= k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 rank list and
    * a vector rank list for the same query documents (doc_id and vec_id
    * are the same id space). rrf(d) = Σ_lists 1/(60 + rank_list(d)),
    * absent-from-list contributing 0 — Cormack/Clarke/Büttcher's
    * parameter-free fusion. Contributions are rounded+decimal-summed
    * like BM25 scores, so ties are exact and the doc_id tie-break total.
    *
    * The vector leg routes through the ANN ladder (`AnnRouter.topKFor`,
    * default "brute" = exact full scan): fusion only needs each list's
    * total order, so a pruned probe ("ivfpq" against a persisted
    * composed index — the 100 TB shape, where the BM25 leg's
    * partition-pruned postings probe would otherwise be drowned by a
    * corpus-width cosine scan) fuses exactly like the exact list.
    *
    * Plan shape: two rank lists of kEach rows per query (tiny), fused with
    * a full outer join on (qid, doc_id) — both sides are already top-k
    * outputs, so fusion cost is negligible next to the probes. */
  def hybridRrfTopK(spark: SparkSession, dir: String, qids: Seq[Long],
                    k: Int, kEach: Int = 20, nTerms: Int = 3,
                    method: String = "brute", nprobe: Int = 2,
                    shortlist: Int = 0, nTables: Int = 4): DataFrame = {
    val bm = bm25TopKFor(spark, dir, qids, kEach, nTerms)
      .select(col("qid"), col("doc_id"), col("bm_rank"))
    val score = col(AnnRouter.scoreColumn(method))
    val annW = Window.partitionBy("qid").orderBy(score.desc, col("vec_id").asc)
    val ann = AnnRouter.topKFor(spark, dir, qids, kEach, nprobe, method, shortlist, nTables)
      .withColumn("ann_rank", row_number().over(annW))
      .select(col("qid"), col("vec_id").as("doc_id"), col("ann_rank"))
    val rrfPart = (r: Column) =>
      coalesce(round(lit(1.0) / (lit(RrfK) + r), 6).cast("decimal(18,6)"),
        lit(BigDecimal(0)).cast("decimal(18,6)"))
    val w = Window.partitionBy("qid").orderBy(col("rrf_score").desc, col("doc_id").asc)
    bm.join(ann, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"),
        (rrfPart(col("bm_rank")) + rrfPart(col("ann_rank"))).cast("double").as("rrf_score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "doc_id", "rrf_score")
      .orderBy(col("qid"), col("rrf_score").desc, col("doc_id"))
  }

  /** RAG CONTEXT ASSEMBLY — the serving-side composition the retrieval
    * stack exists for: per query, take the hybrid-RRF top-k, then pack
    * documents into the context in fused-rank order until a word
    * budget is spent (a document that would overflow the budget is cut
    * and nothing after it enters — the standard greedy context
    * packer). Emits the packed list with per-doc and cumulative word
    * counts so the caller can see exactly what filled the window.
    *
    * Plan shape: the retrieval legs are the hybrid plan (bucket-pruned
    * BM25 + vector top-k); the packing adds one doc-length projection
    * join and a per-query running sum over ≤ k rows — bounded windows
    * only, nothing corpus-wide. */
  def ragContext(spark: SparkSession, dir: String,
                 qids: Seq[Long] = Seq(0L, 1L, 2L), k: Int = 5,
                 budgetWords: Long = 256L): DataFrame = {
    val wRank = Window.partitionBy("qid")
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    val wCum = Window.partitionBy("qid").orderBy("rank")
    val top = hybridRrfTopK(spark, dir, qids, k)
      .withColumn("rank", row_number().over(wRank))
    val wc = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(TextHashing.words(col("text"))).cast("long").as("n_words"))
    top.join(wc, "doc_id")
      .withColumn("cum_words", sum("n_words").over(wCum))
      .filter(col("cum_words") <= budgetWords)
      .select("qid", "rank", "doc_id", "n_words", "cum_words")
      .orderBy("qid", "rank")
  }
}
