package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Replay source (SURVEY §2.1 S1): the v0 stand-in for the reference's
  * WebSocket client — binary frames spooled to parquet files stream back
  * through the engine with pacing.
  *
  * Pacing via maxFilesPerTrigger is the principled version of the
  * reference's bounded-channel backpressure (§2.10 T3,
  * /root/reference/main.go:325-330): instead of dropping ticks on
  * overload, the source simply reads fewer files per micro-batch and the
  * backlog drains in order. Reconnect/backoff (ws/client.go:76-88) is
  * subsumed by checkpoint restart.
  */
object ReplaySource {

  val frameSchema: StructType = StructType(Seq(StructField("payload", BinaryType)))

  /** Spool frames to the replay directory (the capture side). */
  def spool(spark: SparkSession, frames: Seq[Array[Byte]], dir: String): Unit = {
    import spark.implicits._
    frames.toDF("payload").write.mode("append").parquet(dir)
  }

  /** Stream spooled frames back, at most `filesPerTrigger` files per
    * micro-batch. */
  def stream(spark: SparkSession, dir: String, filesPerTrigger: Int = 16): Dataset[Array[Byte]] = {
    import spark.implicits._
    spark.readStream
      .schema(frameSchema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(dir)
      .select(col("payload"))
      .as[Array[Byte]]
  }
}
