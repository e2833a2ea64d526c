package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus loaders. The dedup/analysis operator layer is
  * source-agnostic (TextHashing/DedupIndex/CurationPipeline take
  * DataFrames); these loaders adapt the formats a training-data pipeline
  * actually receives into the canonical documents shape
  * (doc_id, text, lang). Schemas are EXPLICIT — inference over a 100 TB
  * corpus is a full extra scan and a schema-drift hazard.
  */
object DocSources {

  /** `media_b64`: optional base64-encoded media payload (image bytes
    * etc.) — JSONL is text, so binary rides base64; the curation reader
    * decodes it to a `media` binary column for the perceptual-hash gate.
    * Absent/null in text-only corpora. */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("media_b64", StringType)))

  /** JSONL (one JSON object per line), the lingua franca of LLM corpora.
    * Works on .jsonl and compressed .jsonl.gz alike (Spark's text codecs).
    * Rows missing doc_id get a stable row-content id (md5 of text) so
    * downstream dedup keys never collide with real ids (negative range).
    */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    withSyntheticIds(spark.read.schema(documentSchema).json(path))

  /** The one definition of the missing-doc_id scheme (stable content
    * hash, negative range so synthetic ids never collide with real
    * ones) — shared by the batch loader and the streaming curation
    * reader so a document gets the SAME id on every path. */
  def withSyntheticIds(df: DataFrame): DataFrame =
    df.withColumn("doc_id",
      coalesce(col("doc_id"),
        -abs(graft.plans.GraftExtensions.md5Long(col("text")))))

  /** Plain text files: one document per FILE (wholetext), doc_id from the
    * content hash — the raw-crawl shape before any structuring. */
  def textFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(
        (-abs(graft.plans.GraftExtensions.md5Long(col("value")))).as("doc_id"),
        col("value").as("text"),
        lit(null).cast(StringType).as("lang"))
}
