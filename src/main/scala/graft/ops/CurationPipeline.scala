package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed corpus-curation pipeline — the operators above chained the
  * way a pretraining data pipeline actually runs them:
  *
  *   exact-dedup keep-list -> quality gate -> length gate -> survivors
  *
  * One scan feeds the keep-list aggregation and the per-doc metrics; the
  * join is on the content hash (shuffle-partitionable). At 100 TB each
  * stage is the same plan shape, just more partitions.
  */
object CurationPipeline {

  val MinQuality = 0.3
  val MinWords = 20
  val MaxWords = 5000
  /** Context-window shape of the streaming chunk sink (= the batch
    * trainingManifest's). */
  val ChunkMaxTokens = 64
  val ChunkOverlap = 8

  /** Incremental dedup: drop incoming docs whose content fingerprint
    * already exists in the historical index, and dedup within the batch
    * (keep min doc_id). Returns (survivors, updatedIndex). The index is
    * the only state — at 100 TB it's a bucketed table keyed by the
    * fingerprint, and this is one anti join + one agg per batch, never a
    * rescan of history: updatedIndex is an APPEND-ONLY union. Survivors
    * carry exactly one row per fingerprint (the batch keeps min doc_id
    * per fp) and are anti-joined against the index, so their fps are new
    * by construction — no distinct over history, no full-index reshuffle
    * per batch. */
  def incrementalDedup(newDocs: DataFrame, fingerprintIndex: DataFrame): (DataFrame, DataFrame) = {
    val fp = newDocs.withColumn("fp", md5(lower(col("text"))))
    val batchKeep = fp.groupBy("fp").agg(min("doc_id").as("keep_id"))
    val survivors = fp
      .join(batchKeep, Seq("fp"))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
      .join(fingerprintIndex, Seq("fp"), "left_anti")
    val updatedIndex = fingerprintIndex
      .unionByName(survivors.select("fp"))
    (survivors.drop("fp"), updatedIndex)
  }

  /** Incremental NEAR-dup dedup: drop incoming docs that are MinHash
    * near-duplicates of anything curated by a PREVIOUS run, plus
    * near-dups of a smaller-id doc inside the batch — the banded
    * complement of `incrementalDedup`'s exact gate (a doc with one word
    * changed sails through an exact-fingerprint index).
    *
    * Degenerate-text contract: empty/whitespace-only text still yields
    * exactly one shingle (the empty string — `TextHashing.shinglesOf`'s
    * short-doc arm), so such docs ARE signed, indexed, and deduped
    * against each other. Only a NULL text produces no signature: the
    * doc passes this gate un-indexed and is left to the exact
    * fingerprint gate (where a null fp never matches an equi-join, so
    * null-text docs never survive `incrementalDedup` — the decode-
    * failure row is dropped by policy, not silently curated).
    * `Graft.curateCorpus`'s minWords gate removes both shapes earlier.
    *
    * State is two append-only tables, both fixed-width per doc:
    * `bandIndex` (doc_id, band, band_key — 8 rows/doc) and `sigIndex`
    * (doc_id, sig: 32 longs). Per batch: the incoming docs' band keys
    * EQUALITY-join the band index (candidates only — the index is
    * bucketable by band_key at 100 TB), then candidates alone are
    * verified with the signature estimator `TextDedup.estJaccard` — the
    * historical documents' TEXT is never re-read, because the persisted
    * signature is the verification payload. Same-doc_id index hits are
    * ignored, which is what makes a crash-replayed batch (whose own
    * rows may already be indexed) reproduce its original survivor set
    * instead of deleting itself.
    *
    * Returns (survivors, survivorSigs) — the caller appends
    * survivorSigs (and `TextDedup.bandsOf` of them) to the indexes. */
  def incrementalNearDedup(
      newDocs: DataFrame, bandIndex: DataFrame, sigIndex: DataFrame,
      threshold: Double = TextDedup.JaccardThreshold): (DataFrame, DataFrame) = {
    val sigs = TextDedup.minhashSigs(newDocs)
    val bands = TextDedup.bandsOf(sigs)
    val candOld = bands
      .join(bandIndex.select(col("band"), col("band_key"), col("doc_id").as("idx_doc")),
        Seq("band", "band_key"))
      .filter(col("doc_id") =!= col("idx_doc"))
      .select("doc_id", "idx_doc").distinct()
    val dropOld = candOld
      .join(sigs, "doc_id")
      .join(sigIndex.select(col("doc_id").as("idx_doc"), col("sig").as("idx_sig")), "idx_doc")
      .filter(TextDedup.estJaccard(col("sig"), col("idx_sig")) >= threshold)
      .select("doc_id")
    val candNew = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key")
          && col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("smaller"))
      .distinct()
    val dropNew = candNew
      .join(sigs, "doc_id")
      .join(sigs.select(col("doc_id").as("smaller"), col("sig").as("s_sig")), "smaller")
      .filter(TextDedup.estJaccard(col("sig"), col("s_sig")) >= threshold)
      .select("doc_id")
    val dropped = dropOld.unionByName(dropNew).distinct()
    val survivors = newDocs.join(dropped, Seq("doc_id"), "left_anti")
    (survivors, sigs.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi"))
  }

  /** Incremental MEDIA dedup: drop incoming docs whose perceptual hash
    * is within `maxHamming` of anything curated by a previous run, plus
    * phash-near-dups of a smaller-id doc inside the batch — the
    * multimodal sibling of `incrementalNearDedup` (a re-encoded or
    * one-pixel-edited copy of an already-curated image sails through
    * both text gates; this one catches it through the DECODE path).
    *
    * Media column contract: rows are hashed from `media` when the batch
    * carries one (per-row fallback to the text bytes — the fixture
    * stand-in), via the same real-PNG/JPEG-decode-or-stub `phashOf`
    * path as the batch query. Rows whose effective payload is null pass
    * the gate un-indexed (nothing to hash; the upstream minWords gate
    * already dropped null-text docs).
    *
    * State is ONE append-only table, `(doc_id, h0..h3, i, bb)` — 7 rows
    * per doc, the WIDE 240-bit limb-aligned band split
    * (`Multimodal.phash240BandsOf`: 6x30 + 1x60 bits, lossless at
    * hamming<=6 by pigeonhole), bucketable by (i, bb) at 100 TB; the
    * limbs ride in the band rows, so candidate verification is four
    * bit_counts on the joined row — the historical images' BYTES are
    * never re-read or re-decoded. Same-doc_id index hits are ignored
    * (crash-replay safety, as in the text gate).
    *
    * Width is part of the INDEX CONTRACT (round-13 verdict: the gate
    * originally banded the 60-bit face, whose 8-9-bit band keys are a
    * fixed-selectivity filter — candidates grow n^2/2^bits, measured
    * 144 s/d3 58x at sf100 on the batch face; a 30-bit key is ~2^22
    * more selective). A persisted index in the legacy 60-bit shape
    * fails loudly at read time (`requireWidePhashIndex`) instead of
    * silently band-joining mismatched widths.
    *
    * Returns (survivors, survivorBands) — the caller appends
    * survivorBands to the index.
    *
    * `newBands`: the batch's banded phash frame when the caller has
    * already computed (and persisted/checkpointed) it — the decode is
    * the pipeline's most expensive stage with a real codec, and this
    * plan references the band frame on FOUR paths (dropOld, both sides
    * of the in-batch self-join, survivorBands), so an unpersisted
    * default decodes ~4x. `processBatchBody` snapshots it once per
    * batch and passes it here, then reuses the same snapshot for the
    * index write — one decode per incoming doc, total. */
  def incrementalPhashDedup(
      newDocs: DataFrame, phashBandIndex: DataFrame,
      maxHamming: Int = 6,
      newBands: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val bands = newBands.getOrElse(
      Multimodal.phash240BandsOf(Multimodal.phash240Of(effectiveMedia(newDocs))))
    // 240-bit hamming = sum of the four limb popcounts
    def ham(a: String, b: String) =
      (0 to 3).map(k => bit_count(col(s"${a}h$k").bitwiseXOR(col(s"${b}h$k"))))
        .reduce(_ + _)
    val dropOld = bands
      .join(phashBandIndex.select(col("i"), col("bb"),
        col("doc_id").as("idx_doc"), col("h0").as("ih0"), col("h1").as("ih1"),
        col("h2").as("ih2"), col("h3").as("ih3")), Seq("i", "bb"))
      .filter(col("doc_id") =!= col("idx_doc"))
      .filter(ham("", "i") <= maxHamming)
      .select("doc_id").distinct()
    val dropNew = bands.as("x")
      .join(bands.as("y"),
        col("x.i") === col("y.i") && col("x.bb") === col("y.bb")
          && col("x.doc_id") > col("y.doc_id"))
      .filter(ham("x.", "y.") <= maxHamming)
      .select(col("x.doc_id").as("doc_id")).distinct()
    val dropped = dropOld.unionByName(dropNew).distinct()
    val survivors = newDocs.join(dropped, Seq("doc_id"), "left_anti")
    (survivors,
      bands.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi"))
  }

  /** The media payload the phash gate hashes: the batch's `media`
    * column when it carries one (per-row fallback to text bytes when a
    * text column is also present — the fixture stand-in), else the text
    * bytes — one definition shared by the gate and the post-snapshot
    * index recomputation. Null payloads are excluded (pass
    * un-indexed). */
  private def effectiveMedia(docs: DataFrame)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    val hasMedia = docs.columns.contains("media")
    val mediaCol =
      if (hasMedia && docs.columns.contains("text"))
        coalesce(col("media"), col("text").cast("binary"))
      else if (hasMedia) col("media")
      else col("text").cast("binary")
    docs.select(col("doc_id"), mediaCol.as("media"))
      .filter(col("media").isNotNull)
      .as[Multimodal.MediaRow]
  }

  /** Read a batch_id-partitioned index dir with an explicit schema
    * (inference over an empty dir throws forever, wedging the stream)
    * and WITHOUT any rows the current batch itself may have written on a
    * crashed earlier attempt: a replay must see the index AS OF the
    * batch's first attempt, or its own fp rows anti-join the whole batch
    * away and the re-writes go empty — which dynamic overwrite treats as
    * a no-op, permanently leaving any LATER index (bands/sigs written
    * after the crashed fp write) without this batch's rows. Compacted
    * partitions carry negative ids and keepRecent=1 keeps the only
    * replayable batch in its own partition, so excluding
    * `excludeBatchId` touches exactly the replayed attempt's output.
    * Schema convention: batch_id is the LAST field and is dropped from
    * the returned frame. */
  /** The WIDTH side of the phash index contract: `readBatchIndex` reads
    * with an explicit schema, so pointing the wide gate at a legacy
    * 60-bit index (`(doc_id, phash, i, bb)` rows) would silently fill
    * h0..h3 with nulls and band-join 30-bit keys against 8-9-bit ones —
    * every historical hash would stop matching, without an error. A
    * reader must fail LOUDLY on a width-mismatched index instead (the
    * r12 `nBits`-in-the-contract pattern from the vector gate). Schema
    * is checked from parquet footers only — no data scan; an absent or
    * empty dir is a fresh index and passes. */
  private def requireWidePhashIndex(spark: SparkSession, dir: String): Unit = {
    if (!graft.core.Fs.exists(spark, dir)) return
    val names =
      try spark.read.parquet(dir).schema.fieldNames.toSet
      catch { case _: org.apache.spark.sql.AnalysisException => return } // empty dir
    if (names.contains("phash") || !names.contains("h0"))
      throw new IllegalStateException(
        s"phash index at $dir is not the wide 240-bit limb format " +
          s"(found columns ${names.toSeq.sorted.mkString(", ")}; expected " +
          "doc_id, h0..h3, i, bb, batch_id). The 60-bit banding was " +
          "retired from the incremental gate (n^2/2^bits candidates — " +
          "round-13 sf100 measurement); rebuild the index by replaying " +
          "the corpus through the gate, or keep the old engine version " +
          "for this index.")
  }

  private def readBatchIndex(
      spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      excludeBatchId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.schema(schema).parquet(dir)
        .filter(col("batch_id") =!= excludeBatchId)
        .select(schema.fieldNames.init.map(col).toSeq: _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(schema.init))
  }

  /** Streaming curation: incoming documents are incrementally deduped
    * against a PERSISTED fingerprint index inside foreachBatch — the
    * streaming face of `incrementalDedup`. Each batch costs one anti join
    * + one agg against the index (bucket the index by fp at 100 TB);
    * history is never rescanned.
    *
    * Replay-safe: both sinks are laid out as batch_id partitions written
    * with dynamic partition overwrite, so a replayed batch (crash
    * anywhere between the two writes and the offset commit) REPLACES its
    * own corpus and index partitions instead of appending duplicates —
    * the same idempotence scheme as storage.TickTable.appendBatch. Paths
    * go through the Hadoop FileSystem API, so HDFS/S3 index locations
    * work, not just local disk. */
  def streamingDedup(
      docs: DataFrame, corpusDir: String, indexDir: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      compactEvery: Int = 0,
      nearDupDir: Option[String] = None,
      nearDupThreshold: Double = TextDedup.JaccardThreshold,
      textIndexDir: Option[String] = None,
      chunksDir: Option[String] = None,
      benchDir: Option[String] = None,
      modelDir: Option[String] = None,
      minScore: Double = 0.0,
      phashDir: Option[String] = None,
      phashMaxHamming: Int = 6): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, corpusDir, indexDir,
          nearDupDir, nearDupThreshold, compactEvery, textIndexDir, chunksDir,
          benchDir, modelDir, minScore, phashDir, phashMaxHamming)
      }
      .start()

  /** ONE micro-batch of the text-curation pipeline — the exact body
    * `streamingDedup`'s foreachBatch runs (extracted so `replayBatches`
    * can drive the identical code path batch-for-batch under the
    * DuckDB oracle — the streaming gates' correctness evidence, not
    * just their specs'). */
  private[ops] def processBatch(
      batch: DataFrame, batchId: Long, corpusDir: String, indexDir: String,
      nearDupDir: Option[String], nearDupThreshold: Double,
      compactEvery: Int, textIndexDir: Option[String] = None,
      chunksDir: Option[String] = None,
      benchDir: Option[String] = None,
      modelDir: Option[String] = None,
      minScore: Double = 0.0,
      phashDir: Option[String] = None,
      phashMaxHamming: Int = 6): Unit = {
    // gate latency lands in the process-wide histogram (`/metrics`
    // `graft_gate_duration_seconds_bucket` series) — one observation
    // per batch, driver-side, reference-bucket shape
    val gateT0 = System.nanoTime()
    try processBatchBody(batch, batchId, corpusDir, indexDir,
      nearDupDir, nearDupThreshold, compactEvery, textIndexDir, chunksDir,
      benchDir, modelDir, minScore, phashDir, phashMaxHamming)
    finally graft.obs.PipelineMetrics.gateDuration.observeNanos(System.nanoTime() - gateT0)
  }

  private def processBatchBody(
      batch0: DataFrame, batchId: Long, corpusDir: String, indexDir: String,
      nearDupDir: Option[String], nearDupThreshold: Double,
      compactEvery: Int, textIndexDir: Option[String],
      chunksDir: Option[String],
      benchDir: Option[String],
      modelDir: Option[String] = None,
      minScore: Double = 0.0,
      phashDir: Option[String] = None,
      phashMaxHamming: Int = 6): Unit = {
    // the TRAINED quality gate (when a persisted model is given): docs
    // whose margin under the session-cached weight table falls below
    // minScore never enter the pipeline — the deployment face of
    // QualityClassifier.buildModel (the heuristic quality gate upstream
    // filters on rules; this one filters on the learned model). Docs
    // with no scoreable feature are dropped too: nothing to assess.
    val batch = modelDir match {
      case None => batch0
      case Some(md) =>
        val passing = QualityClassifier.scoreFrameWith(batch0, md)
          .filter(org.apache.spark.sql.functions.col("score") >= minScore)
          .select("doc_id")
        batch0.join(passing, Seq("doc_id"), "left_semi")
    }
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}
    val spark = batch.sparkSession
    val index = readBatchIndex(spark, indexDir, StructType(Seq(
      StructField("fp", StringType), StructField("batch_id", LongType))), batchId)
    val (exactSurvivors, _) = incrementalDedup(batch, index)
    // the near-dup gate (when enabled) runs on the exact survivors:
    // banded-candidate lookup against the persisted band index, then
    // signature verification — one equality join + one candidate-only
    // join per batch, history never rescanned
    val afterNear = nearDupDir match {
      case None => exactSurvivors
      case Some(nd) =>
        val bandIdx = readBatchIndex(spark, s"$nd/bands", StructType(Seq(
          StructField("doc_id", LongType), StructField("band", IntegerType),
          StructField("band_key", StringType), StructField("batch_id", LongType))), batchId)
        val sigIdx = readBatchIndex(spark, s"$nd/sigs", StructType(Seq(
          StructField("doc_id", LongType), StructField("sig", ArrayType(LongType)),
          StructField("batch_id", LongType))), batchId)
        incrementalNearDedup(exactSurvivors, bandIdx, sigIdx, nearDupThreshold)._1
    }
    // the media gate (when enabled) runs on the text survivors: banded
    // phash lookup against the persisted (i, bb)-bucketable band index,
    // hamming verify on the joined rows — history is never re-read, and
    // the batch's own decode runs ONCE: the band frame is eagerly
    // localCheckpoint'd here (same rationale as `out` below — a merely
    // persisted plan would be invalidated by the later index-path
    // writes and silently recompute) and the SAME snapshot feeds the
    // gate's four references and the index write.
    var phashBatchBands: Option[DataFrame] = None
    val afterPhash = phashDir match {
      case None => afterNear
      case Some(pd) =>
        requireWidePhashIndex(spark, s"$pd/bands")
        val phIdx = readBatchIndex(spark, s"$pd/bands", StructType(Seq(
          StructField("doc_id", LongType),
          StructField("h0", LongType), StructField("h1", LongType),
          StructField("h2", LongType), StructField("h3", LongType),
          StructField("i", IntegerType), StructField("bb", LongType),
          StructField("batch_id", LongType))), batchId)
        val bands = Multimodal.phash240BandsOf(
          Multimodal.phash240Of(effectiveMedia(afterNear))).localCheckpoint(true)
        phashBatchBands = Some(bands)
        incrementalPhashDedup(afterNear, phIdx, phashMaxHamming,
          newBands = Some(bands))._1
    }
    // eager localCheckpoint when any index-backed gate ran, NOT
    // persist: writing the fp index below auto-invalidates every
    // cached plan that READS the index paths — including the
    // survivors' anti-joins — so a merely persisted frame would
    // silently recompute against the already-updated index (= empty)
    // for the later band/sig/phash writes. The checkpoint snapshots
    // the rows with no path dependency left to invalidate.
    val out =
      if (nearDupDir.isEmpty && phashDir.isEmpty) afterPhash.persist()
      else afterPhash.localCheckpoint(true)
    // index rows are recomputed from the snapshotted survivors (one
    // shingling pass over a small batch). The phash rows are NOT
    // re-decoded: the batch's band snapshot already holds every
    // incoming doc's bands, so the survivors' rows are a semi join of
    // two checkpoints — no path dependency, no second decode.
    val sigsOut = nearDupDir.map(_ => TextDedup.minhashSigs(out).persist())
    val phashBandsOut = phashBatchBands.map(bands =>
      bands.join(out.select("doc_id"), Seq("doc_id"), "left_semi").persist())
    try {
      out.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(corpusDir)
      // training-ready chunks of THIS batch's survivors — derived data
      // of the same rows, same batch_id-partitioned dynamic-overwrite
      // idempotence as the corpus sink (a replayed batch replaces its
      // own chunk partitions; dropped docs never chunk)
      // the STREAMING decontamination gate: chunks are the training
      // feed, so docs containing any verbatim benchmark 13-gram stay in
      // the curated corpus (curation != eval hygiene) but never chunk.
      // The benchmark gram table is tiny by definition, static per
      // stream, and SESSION-CACHED (cachedBenchGrams): batch #1
      // materializes it once, every later batch broadcasts the cached
      // table — the per-batch work is one pass over THIS batch's
      // survivors, never history and never the benchmark again.
      chunksDir.foreach { cd =>
        val chunkSrc = benchDir match {
          case None => out.select("doc_id", "text")
          case Some(bd) =>
            val flagged = TextDedup.exactNgramContaminationAgainst(
                out.select("doc_id", "text"),
                TextDedup.cachedBenchGrams(spark, bd))
              .select("doc_id").distinct()
            out.select("doc_id", "text")
              .join(flagged, Seq("doc_id"), "left_anti")
        }
        TextAnalysis.chunkDocumentsDf(chunkSrc,
            ChunkMaxTokens, ChunkOverlap)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(cd)
      }
      out.select(md5(lower(col("text"))).as("fp")).distinct()
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(indexDir)
      // replay consistency rests on readBatchIndex excluding this
      // batch's own partitions: whatever prefix of the four writes a
      // crash left behind, the re-run recomputes the same survivors
      // against the pre-batch index state and dynamic-overwrites
      // every partition it owns
      sigsOut.foreach { sigs =>
        val nd = nearDupDir.get
        TextDedup.bandsOf(sigs)
          .select("doc_id", "band", "band_key")
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$nd/bands")
        sigs.select("doc_id", "sig")
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"$nd/sigs")
      }
      phashBandsOut.foreach { pb =>
        pb.select("doc_id", "h0", "h1", "h2", "h3", "i", "bb")
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(s"${phashDir.get}/bands")
      }
      // retrieval-index maintenance rides the same replay recipe: the
      // batch's survivors append as (batch_id, bucket) delta postings
      // (dynamic overwrite of their own partitions), the batch stats
      // row commits them last — so keyword search over the curated
      // corpus is ALWAYS append-exact (== a rebuild over everything
      // accepted so far), and a crash-replayed batch repairs its own
      // text-index partitions along with its corpus/fp/band/sig ones
      textIndexDir.foreach { tid =>
        if (!graft.core.Fs.exists(spark, TextRanking.textStatsPath(tid)))
          TextRanking.initTextIndex(spark, tid)
        TextRanking.appendToTextIndex(spark, tid, out.select("doc_id", "text"), batchId)
      }
    } finally {
      out.unpersist()
      sigsOut.foreach(_.unpersist())
      phashBandsOut.foreach(_.unpersist())
      releaseLocalCheckpoint(out)
      phashBatchBands.foreach(releaseLocalCheckpoint)
    }
    // periodic sink maintenance from INSIDE the running pipeline (no
    // external scheduler): every `compactEvery` batches, cold batch
    // dirs collapse so the index read path stays O(1) partitions over
    // an unbounded run. keepRecent=1 keeps this batch's partition
    // intact, so a post-crash replay of it still dynamic-overwrites
    // its own output — idempotence is untouched.
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      compactSink(spark, corpusDir)
      compactSink(spark, indexDir)
      nearDupDir.foreach { nd =>
        compactSink(spark, s"$nd/bands")
        compactSink(spark, s"$nd/sigs")
      }
      phashDir.foreach(pd => compactSink(spark, s"$pd/bands"))
      // the text index compacts with keepRecent=1 — same contract as
      // compactSink: this batch's delta partitions survive the fold, so
      // a post-crash replay still dynamic-overwrites its own output
      // instead of double-appending rows the fold moved into the base
      textIndexDir.foreach(t => TextRanking.compactTextIndex(spark, t, keepRecent = 1))
    }
  }

  /** Drive the EXACT streaming-curation batch body over an explicit
    * batch partitioning of a static frame — the oracle-checkable face
    * of `streamingDedup`: same `processBatch` code, same persisted
    * batch_id-partitioned indexes, same sequential gate semantics, just
    * without a checkpoint/trigger in the loop. Batch ids come from
    * `batchCol` and are processed in ascending order (the collect is
    * bounded by the NUMBER of batches, never rows). Returns the curated
    * corpus read back from `corpusDir` (batch_id partition included). */
  def replayBatches(docs: DataFrame, batchCol: org.apache.spark.sql.Column,
                    corpusDir: String, indexDir: String,
                    nearDupDir: Option[String] = None,
                    nearDupThreshold: Double = TextDedup.JaccardThreshold,
                    chunksDir: Option[String] = None,
                    benchDir: Option[String] = None,
                    phashDir: Option[String] = None,
                    phashMaxHamming: Int = 6): DataFrame = {
    val withB = docs.withColumn("__replay_b", batchCol.cast("long"))
    val ids = withB.select("__replay_b").distinct()
      .collect().map(_.getLong(0)).sorted
    ids.foreach { b =>
      processBatch(withB.filter(col("__replay_b") === b).drop("__replay_b"),
        b, corpusDir, indexDir, nearDupDir, nearDupThreshold, compactEvery = 0,
        textIndexDir = None, chunksDir = chunksDir, benchDir = benchDir,
        phashDir = phashDir, phashMaxHamming = phashMaxHamming)
    }
    docs.sparkSession.read.parquet(corpusDir)
  }

  /** CORRECTNESS face of the streaming gates: replay the documents
    * table as 3 deterministic micro-batches (doc_id % 3, ascending)
    * through `processBatch` with REAL persisted fp/band/sig indexes in
    * a fresh temp dir, and emit the final curated corpus with the batch
    * each doc survived in. The DuckDB oracle applies the exact gate +
    * banded near-dup gate sequentially, batch by batch. */
  def curationReplay(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("curation_replay").toString
    try {
      val corpus = replayBatches(docs, col("doc_id") % 3,
        s"$tmp/corpus", s"$tmp/fp", Some(s"$tmp/nd"))
      // snapshot, then the scratch corpus/indexes can be deleted — each
      // invocation otherwise leaks a full replayed-corpus copy to /tmp
      // (bench alone runs this 4+ times per round). The snapshot is a
      // few thousand (doc_id, batch_id) rows; the ContextCleaner reaps
      // its blocks when the returned frame goes unreachable.
      corpus.select(col("doc_id"), col("batch_id").cast("long").as("batch_id"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally deleteRecursively(new java.io.File(tmp))
  }

  /** `curation_replay_decontam` query face: the same 3-batch replay
    * with the streaming chunk sink AND the benchmark gate on — bench =
    * the doc_id % 20 = 0 subset (written to a scratch parquet dir, as a
    * user would point benchDir at an eval set). Every bench doc in the
    * corpus flags itself, so the output proves contaminated docs are
    * CURATED yet never CHUNK. Emits per-doc chunk stats with the batch
    * the doc survived in. */
  def curationReplayDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("curation_replay_dc").toString
    try {
      docs.filter(col("doc_id") % 20 === 0).write.parquet(s"$tmp/bench")
      replayBatches(docs, col("doc_id") % 3,
        s"$tmp/corpus", s"$tmp/fp", Some(s"$tmp/nd"),
        chunksDir = Some(s"$tmp/chunks"), benchDir = Some(s"$tmp/bench"))
      spark.read.parquet(s"$tmp/chunks")
        .groupBy(col("doc_id"), col("batch_id").cast("long").as("batch_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum("n_tokens").cast("long").as("n_tokens"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Streaming EMBEDDING dedup — `streamingDedup`'s vector-modality
    * sibling: each micro-batch of (vec_id, embedding) rows is gated by
    * `Similarity.incrementalNearDup` against the PERSISTED fixed-width
    * vector index, survivors land in batch_id-partitioned parquet with
    * the same dynamic-overwrite replay idempotence, and the index grows
    * append-only (one (vec_id, bkt, v, nrm) row per survivor). Same
    * maintenance protocol: in-pipeline compaction every `compactEvery`
    * batches keeps both read paths O(1) partitions.
    *
    * `nBits` is part of the INDEX CONTRACT, like `threshold`: persisted
    * bkt values are nBits-dependent, so every run against the same
    * indexDir must pass the same value. Size it for the EXPECTED corpus
    * (`Similarity.autoNBits(expectedVecs)`): bucket population is
    * n / 2^nBits and the per-batch candidate join is quadratic in it —
    * the default 4 (16 buckets) was measured at 2M vectors spending
    * ~30 min/batch on ~1.4e11 bucket pairs that 14 bits cut ~340x.
    * More bits trade recall for that speed (an exact duplicate always
    * shares its source's bucket at ANY nBits; a merely-near vector can
    * drift more than one sign plane), which is why the gate does not
    * silently auto-size per batch: recall and bkt layout must not
    * change under a stream's feet. */
  def streamingVectorDedup(
      vecs: DataFrame, corpusDir: String, indexDir: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      threshold: Double = 0.9,
      compactEvery: Int = 0,
      nBits: Int = 4): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processVectorBatch(batch, batchId, corpusDir, indexDir, threshold,
          compactEvery, nBits)
      }
      .start()

  /** ONE micro-batch of the vector-curation pipeline — the exact body
    * `streamingVectorDedup`'s foreachBatch runs (extracted for
    * `replayVectorBatches`, like `processBatch` for the text gate). */
  private[ops] def processVectorBatch(
      batch: DataFrame, batchId: Long, corpusDir: String, indexDir: String,
      threshold: Double, compactEvery: Int, nBits: Int = 4): Unit = {
    import org.apache.spark.sql.types._
    val spark = batch.sparkSession
    val index = readBatchIndex(spark, indexDir, StructType(Seq(
      StructField("vec_id", LongType), StructField("bkt", LongType),
      StructField("v", ArrayType(DoubleType)), StructField("nrm", DoubleType),
      StructField("batch_id", LongType))), batchId)
    val (survivors, _) =
      graft.ops.Similarity.incrementalNearDup(batch, index, threshold, nBits)
    // snapshot before the sink writes: the index write below
    // invalidates every cached plan reading indexDir (see
    // streamingDedup's near-dup path for the measured failure)
    val out = survivors.localCheckpoint(true)
    // index rows re-derived from the snapshot (no path deps)
    val rows = graft.ops.Similarity.vectorIndexRows(out, nBits)
    try {
      out.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(corpusDir)
      rows.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(indexDir)
    } finally releaseLocalCheckpoint(out)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      compactSink(spark, corpusDir)
      compactSink(spark, indexDir)
    }
  }

  /** `replayBatches`'s vector-modality sibling: drive the exact
    * streaming batch body over an explicit batch partitioning of a
    * static (vec_id, embedding) frame, against REAL persisted
    * batch_id-partitioned index dirs. */
  def replayVectorBatches(vecs: DataFrame, batchCol: org.apache.spark.sql.Column,
                          corpusDir: String, indexDir: String,
                          threshold: Double, nBits: Int = 4): DataFrame = {
    val withB = vecs.withColumn("__replay_b", batchCol.cast("long"))
    val ids = withB.select("__replay_b").distinct()
      .collect().map(_.getLong(0)).sorted
    ids.foreach { b =>
      processVectorBatch(withB.filter(col("__replay_b") === b).drop("__replay_b"),
        b, corpusDir, indexDir, threshold, compactEvery = 0, nBits = nBits)
    }
    vecs.sparkSession.read.parquet(corpusDir)
  }

  /** CORRECTNESS face of the streaming VECTOR gate: replay the
    * embeddings table as 3 deterministic micro-batches (vec_id % 3)
    * through `processVectorBatch` with a real persisted fixed-width
    * vector index, at the fixture-scale threshold (0.35 — the corpus's
    * near-dup range; production gates pass 0.9+). The DuckDB oracle
    * applies the sign-bucket + Hamming-1 candidate generation and the
    * cosine verification sequentially, batch by batch.
    *
    * nBits is auto-sized from the corpus count (`Similarity.autoNBits`,
    * the formula the oracle mirrors in SQL) — the replay face KNOWS the
    * whole corpus, so it sizes buckets the way a production caller
    * would size them from the expected stream volume. At the gate
    * scales (500 / 2000 vectors) the formula lands on the legacy 4
    * bits, so oracle values are unchanged there; at sf100 (2M vectors)
    * it is the difference between ~1.4e11 bucket pairs (~30 min/run,
    * measured) and ~4e8. */
  def vectorCurationReplay(spark: SparkSession, dir: String): DataFrame = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val bits = graft.ops.Similarity.autoNBits(vecs.count())
    val tmp = java.nio.file.Files.createTempDirectory("vec_replay").toString
    try {
      val corpus = replayVectorBatches(vecs, col("vec_id") % 3,
        s"$tmp/corpus", s"$tmp/index", threshold = 0.35, nBits = bits)
      // snapshot-then-delete, like curationReplay
      corpus.select(col("vec_id"), col("batch_id").cast("long").as("batch_id"))
        .orderBy("vec_id")
        .localCheckpoint(true)
    } finally deleteRecursively(new java.io.File(tmp))
  }

  /** ONE micro-batch of the standalone MEDIA-curation pipeline — the
    * phash gate driven directly over a (doc_id, media) batch, the
    * multimodal sibling of `processVectorBatch`: band the batch's
    * phashes ONCE (eager localCheckpoint — the gate references the
    * frame on four paths and the index write below would invalidate a
    * merely-persisted plan), gate against the persisted band index,
    * write survivors to batch_id-partitioned parquet and append their
    * band rows to the index. Same dynamic-overwrite replay idempotence
    * and same-batch index exclusion as the text/vector gates. */
  private[ops] def processMediaBatch(
      batch: DataFrame, batchId: Long, corpusDir: String, phashDir: String,
      maxHamming: Int): Unit = {
    import org.apache.spark.sql.types._
    val spark = batch.sparkSession
    requireWidePhashIndex(spark, phashDir)
    val phIdx = readBatchIndex(spark, phashDir, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("h0", LongType), StructField("h1", LongType),
      StructField("h2", LongType), StructField("h3", LongType),
      StructField("i", IntegerType), StructField("bb", LongType),
      StructField("batch_id", LongType))), batchId)
    val bands = Multimodal.phash240BandsOf(
      Multimodal.phash240Of(effectiveMedia(batch))).localCheckpoint(true)
    try {
      val (survivors, _) =
        incrementalPhashDedup(batch, phIdx, maxHamming, newBands = Some(bands))
      val out = survivors.localCheckpoint(true)
      try {
        out.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(corpusDir)
        // index rows = the batch's band snapshot semi-joined to the
        // survivor snapshot: no path deps, no second decode
        bands.join(out.select("doc_id"), Seq("doc_id"), "left_semi")
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(phashDir)
      } finally releaseLocalCheckpoint(out)
    } finally releaseLocalCheckpoint(bands)
  }

  /** `replayBatches`'s media-modality sibling: drive the exact batch
    * body over an explicit batch partitioning of a static
    * (doc_id, media) frame, against a REAL persisted
    * batch_id-partitioned band index. */
  def replayMediaBatches(docs: DataFrame, batchCol: org.apache.spark.sql.Column,
                         corpusDir: String, phashDir: String,
                         maxHamming: Int = 6): DataFrame = {
    val withB = docs.withColumn("__replay_b", batchCol.cast("long"))
    val ids = withB.select("__replay_b").distinct()
      .collect().map(_.getLong(0)).sorted
    ids.foreach { b =>
      processMediaBatch(withB.filter(col("__replay_b") === b).drop("__replay_b"),
        b, corpusDir, phashDir, maxHamming)
    }
    docs.sparkSession.read.parquet(corpusDir)
  }

  /** CORRECTNESS face of the streaming MEDIA gate (round-12 verdict #7:
    * the text and vector gates had replay oracles, the phash gate had
    * specs only): replay the corpus media column — text-byte stand-ins
    * (all-stub phash) UNIONED with the planted decodable PNGs, exactly
    * the `media_phash_dedup` population — as 3 deterministic
    * micro-batches (pmod(doc_id, 3)) through `processMediaBatch` with a
    * real persisted band index. The DuckDB oracle replays the same
    * batches sequentially with DIRECT hamming joins, recomputing the
    * planted aHashes from the shared pixel formula: banding is lossless
    * at the default radius (pigeonhole, MultimodalSpec), so a banded
    * candidate set that missed a pair would hash-mismatch here — the
    * oracle independently checks the banding, not just the verify.
    *
    * The planted groups land edit -> re-encode -> base across the three
    * batches (pmod of the negative ids), so the output proves BOTH gate
    * arms: the re-encode and base are dropped by the INDEX (cross-batch
    * hits through the real decode path), while corpus exact-dup text
    * payloads exercise the in-batch smaller-id rule. */
  def mediaCurationReplay(spark: SparkSession, dir: String,
                          maxHamming: Int = 6): DataFrame = {
    import spark.implicits._
    val planted = spark.createDataset(
      Multimodal.plantedPngs().map { case (id, b) => Multimodal.MediaRow(id, b) })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .unionByName(planted.toDF())
    mediaReplayOver(docs, maxHamming)
  }

  /** The media-gate replay over the MIXED population (a real decodable-
    * image fraction, `Multimodal.mixedMediaTable`): the face that
    * measures the gate's decode-once discipline and wide-band candidate
    * cost when 1/den of the corpus actually decodes — under load, not on
    * 12 fixture images. Oracle-checked like `mediaCurationReplay` (the
    * mixed arm's hashes recompute from the shared md5-60 pixel
    * formula). */
  def mediaCurationReplayMixed(spark: SparkSession, dir: String,
                               maxHamming: Int = 6, den: Int = 100): DataFrame = {
    import spark.implicits._
    val planted = spark.createDataset(
      Multimodal.plantedPngs().map { case (id, b) => Multimodal.MediaRow(id, b) })
    mediaReplayOver(
      Multimodal.mixedMediaTable(spark, dir, den).toDF().unionByName(planted.toDF()),
      maxHamming)
  }

  /** Shared replay body: 3 deterministic pmod batches through
    * `processMediaBatch` against a real persisted wide-band index,
    * snapshot-then-delete. */
  private def mediaReplayOver(docs: DataFrame, maxHamming: Int): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("media_replay").toString
    try {
      val corpus = replayMediaBatches(docs, pmod(col("doc_id"), lit(3)),
        s"$tmp/corpus", s"$tmp/ph", maxHamming)
      // snapshot-then-delete, like curationReplay
      corpus.select(col("doc_id"), col("batch_id").cast("long").as("batch_id"))
        .orderBy("doc_id")
        .localCheckpoint(true)
    } finally deleteRecursively(new java.io.File(tmp))
  }

  /** Release the RDD blocks behind a localCheckpoint'd frame.
    * `Dataset.unpersist` is a NO-OP for a checkpointed frame — the
    * snapshot is persisted at the RDD layer (outside the CacheManager),
    * so an unbounded streaming run would otherwise accumulate one
    * checkpoint block set per micro-batch in executor storage until
    * driver GC lets the ContextCleaner reap them. Scoped precisely to
    * THIS frame's plan (no global persistent-RDD sweep — concurrent
    * streams' checkpoints must not be touched). Only call after every
    * read of the frame has completed: a local checkpoint has no lineage
    * to recompute from. No-op for non-checkpointed frames. */
  private def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))

  /** Merge cold batch_id partitions of a streaming-dedup sink (corpus or
    * fingerprint index): thousands of micro-batches = thousands of tiny
    * partitions on the index read path every batch, so a periodic
    * compaction collapses everything but the `keepRecent` newest batches
    * into one negative-id partition. keepRecent=1 is replay-safe by
    * construction: a checkpointed stream can only ever replay its most
    * recent uncommitted batch, and that batch keeps its own partition so
    * its dynamic-overwrite idempotence is untouched. Crash-safe via
    * `Compaction`'s manifest journal (publish-then-delete, roll-forward
    * recovery). */
  def compactSink(spark: SparkSession, dir: String, keepRecent: Int = 1, numFiles: Int = 1): Unit =
    graft.storage.Compaction.compactBatchDirs(spark, dir, keepRecent, numFiles)

  def filteredCorpus(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.qualityScore(spark, dir)
    val keepIds = TextDedup.exact(spark, dir).select(col("keep_id").as("doc_id"))
    quality
      .join(keepIds, "doc_id") // exact-dup survivors only
      .filter(col("quality_score") >= MinQuality
        && col("n_words") >= MinWords && col("n_words") <= MaxWords)
      .select("doc_id", "n_words", "quality_score")
      .orderBy("doc_id")
  }

  /** The whole batch pretraining-data pipeline as ONE composed plan —
    * what a user runs to turn a raw corpus into training-ready chunks:
    *
    *  1. near-dup dedup with the production keep-rule (best-quality doc
    *     per MinHash cluster, `TextDedup.dedupKeepBest`);
    *  2. quality gate (same thresholds as the streaming curation gate:
    *     quality >= 0.3, 20 <= words <= 5000);
    *  3. benchmark holdout (docs 0 mod 20 are the eval set — never
    *     trained on) and exact 13-gram decontamination against it
    *     (`TextDedup.exactNgramContamination` — any training doc
    *     containing a verbatim benchmark gram is dropped);
    *  4. context-window chunking (64/8, `TextAnalysis.chunkDocuments`).
    *
    * Returns the per-document manifest (doc_id, quality_score,
    * n_chunks, n_tokens-with-overlap) — compact enough to hash, yet a
    * change ANYWHERE in the four stages flips it. Every stage is the
    * same session-cached table / broadcast probe the standalone
    * operators use, so the composition costs what its stages cost. */
  def trainingManifest(spark: SparkSession, dir: String): DataFrame = {
    val d = TextDedup.docs(spark, dir)
    val q = TextAnalysis.withQuality(d).select(col("doc_id"), col("n_words"))
    val kept = TextDedup.dedupKeepBest(spark, dir)
      .join(q, "doc_id")
      .filter(col("quality_score") >= MinQuality
        && col("n_words") >= MinWords && col("n_words") <= MaxWords)
      .filter(col("doc_id") % 20 =!= 0) // the benchmark holdout itself
    val flagged = TextDedup.exactNgramContamination(
        d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0), n = 13)
      .select("doc_id").distinct()
    val clean = kept.join(flagged, Seq("doc_id"), "left_anti")
    TextAnalysis.chunkDocumentsDf(
        clean.select("doc_id", "quality_score")
          .join(d.select("doc_id", "text"), "doc_id"),
        maxTokens = 64, overlap = 8)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("n_tokens"))
      .join(clean.select("doc_id", "quality_score"), "doc_id")
      .select("doc_id", "quality_score", "n_chunks", "n_tokens")
      .orderBy("doc_id")
  }

  /** CURRICULUM over the curated manifest — the composed layout a
    * training job actually consumes: the [[trainingManifest]] survivors
    * (deduped, quality-gated, holdout- and contamination-free) banded
    * into z-score difficulty phases with md5 shards. Band statistics
    * are computed over the SURVIVORS (the honest banding for what you
    * train on — curation shifts the difficulty distribution, and bands
    * from the raw corpus would mislabel the tails), while per-doc
    * difficulty keeps the full-corpus lexicon like every surprisal
    * face. One extra semi-join over curriculumAssign's plan; every
    * stage rides the session caches the manifest already warmed. */
  def curriculumManifest(spark: SparkSession, dir: String,
                         nShards: Int = 16): DataFrame = {
    val surv = trainingManifest(spark, dir).select("doc_id")
    TextAnalysis.zBandAssign(
      TextAnalysis.unigramSurprisal(spark, dir).join(surv, "doc_id"), nShards)
  }
}
