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
      compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val indexPath = new org.apache.hadoop.fs.Path(indexDir)
        val fs = indexPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // explicit schema: an index dir created by an empty batch holds no
        // parquet files, and schema INFERENCE over it throws forever,
        // wedging the stream — with the schema supplied it reads empty
        val indexSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fp",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType)))
        val index =
          if (fs.exists(indexPath))
            spark.read.schema(indexSchema).parquet(indexDir).select("fp")
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(indexSchema.take(1)))
        val (survivors, _) = incrementalDedup(batch, index)
        val out = survivors.persist()
        try {
          out.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(corpusDir)
          out.select(md5(lower(col("text"))).as("fp")).distinct()
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(indexDir)
        } finally out.unpersist()
        // periodic sink maintenance from INSIDE the running pipeline (no
        // external scheduler): every `compactEvery` batches, cold batch
        // dirs collapse so the index read path stays O(1) partitions over
        // an unbounded run. keepRecent=1 keeps this batch's partition
        // intact, so a post-crash replay of it still dynamic-overwrites
        // its own output — idempotence is untouched.
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          compactSink(spark, corpusDir)
          compactSink(spark, indexDir)
        }
        ()
      }
      .start()

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
}
