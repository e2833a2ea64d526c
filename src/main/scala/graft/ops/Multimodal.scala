package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata extracted by a per-partition
  * decoder. The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; the Spark-side shape — binary column,
  * mapPartitions batching, reused decoder state per partition, typed output
  * schema — is the real, tested contract a codec would drop into.
  *
  * Scale posture: decode is embarrassingly parallel per partition; the
  * MessageDigest (stand-in for a codec context) is allocated once per
  * partition, not per row — the pattern that matters when each "decode" is
  * a 10 ms native call at 100 TB.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, media_md5: String, format: String,
      width: Long, height: Long, n_frames: Long)

  /** STUB decode: derives fake format/dimensions/frame-count
    * deterministically from the payload hash + length. A real deployment
    * replaces the body with an actual codec call; the signature stays. */
  def decodeStub(docId: Long, bytes: Array[Byte], md: MessageDigest): MediaFeatures = {
    md.reset()
    val digest = md.digest(bytes)
    val hex = digest.map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val n = bytes.length.toLong
    MediaFeatures(
      doc_id = docId,
      n_bytes = n,
      media_md5 = hex,
      format = (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webm" },
      width = h % 1280,
      height = (h / 1280) % 720,
      n_frames = n % 30 + 1)
  }

  /** documents.text re-cast as a binary media column — the fixture tables
    * carry no real blobs, so the text bytes stand in for the payload. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** Decode-once: the features table is computed ONCE per (session, dir)
    * and persisted (SessionCache); every derived query (frame sampling,
    * resize planning, format stats) reads the cache instead of re-running
    * the decode. With a real codec at ~10 ms/frame, re-decoding per
    * derived query at 100 TB multiplies the single most expensive stage
    * of the pipeline — decode feeds a materialized features table, and
    * everything else derives. Rewrote documents.parquet mid-session?
    * `SessionCache.invalidate(spark, "mmfeat", dir)` first. */
  def features(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "mmfeat", dir) {
      import spark.implicits._
      mediaTable(spark, dir)
        .mapPartitions { rows =>
          val md = MessageDigest.getInstance("MD5")
          rows.map(r => decodeStub(r.doc_id, r.media, md))
        }
        .toDF()
    }

  /** Feature-extraction pass: one codec context per partition, streamed
    * row batches, typed output (ordered for the oracle contract). */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir).orderBy("doc_id")

  /** Frame sampling: every 5th frame index per media payload (the
    * video-preprocessing shape: one row out per sampled frame, ready for
    * a per-frame decode stage). Pure plan-side explode — the frame list
    * never materializes on the driver. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .filter(col("format") === "webm")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  /** Resize planning: letterbox every (fake) image into a 224x224 budget —
    * integer target dims from double scale arithmetic, identical in the
    * oracle. A real codec slots into the decode stage; the geometry pass
    * stays exactly this. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    val w = greatest(col("width"), lit(1L)).cast("double")
    val h = greatest(col("height"), lit(1L)).cast("double")
    val scale = least(lit(224.0) / w, lit(224.0) / h)
    features(spark, dir)
      .filter(col("format").isin("jpeg", "png"))
      .select(col("doc_id"), col("width"), col("height"),
        floor(w * scale).cast("long").as("out_width"),
        floor(h * scale).cast("long").as("out_height"))
      .orderBy("doc_id")
  }

  /** Aggregate media stats by fake format — the "how much of each modality
    * do we have" query every dataset card needs. */
  def formatStats(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        round(avg("width"), 4).as("avg_width"))
      .orderBy("format")
}
