package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketches as STREAMING STATE — the streaming face of the
  * batch sketch panels (`TextAnalysis.cmsHeavyHitters`,
  * `hllGramCardinality`): the defining property of these sketches is
  * that their state is fixed-size and their update is an associative
  * merge, which is exactly the contract of a Spark streaming
  * aggregation. No custom state function needed: the count-min grid IS
  * `groupBy(row, bucket).count` with d x w bounded state, maintained
  * incrementally across micro-batches by the engine's own aggregation
  * state store. At 100 TB/day this is how word frequencies stay
  * queryable without ever materializing a vocabulary.
  */
object Sketches {

  /** Count-min cell maintenance over a STREAMING docs frame
    * (doc_id, text, ...): the same d x w md5 grid as the batch panel
    * (`TextAnalysis.cmsCellColumns` — one hash definition for both
    * sides), kept as streaming-aggregation state. Run with output mode
    * Update/Complete; the state is exactly d*w counters regardless of
    * stream volume. A cold consumer estimates a word's count as
    * min over its d cells, identically to the batch estimate on the
    * same data (SketchStreamSpec pins stream == batch). */
  def cmsCells(docsStream: DataFrame, d: Int = 4, w: Int = 256): DataFrame =
    docsStream
      .withColumn("ws", graft.ops.TextHashing.words(col("text")))
      .select(explode(col("ws")).as("w"))
      .select(posexplode(graft.ops.TextAnalysis.cmsCellColumns(col("w"), d, w))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cell"))

  /** HLL register maintenance over a STREAMING docs frame (doc_id,
    * text, source, ...): the batch panel's (source, register, max rho)
    * table as streaming-aggregation state — max is the mergeable
    * update, state is sources x m registers at any volume, and a cold
    * consumer computes the SAME alpha*m^2/SUM estimate the batch query
    * emits (`TextAnalysis.hllRegistersOf` — one register definition
    * for both sides; SketchStreamSpec pins stream == batch). */
  def hllRegisters(docsStream: DataFrame, m: Int = 64,
                   n: Int = 3): DataFrame =
    graft.ops.TextAnalysis.hllRegistersOf(
      docsStream
        .withColumn("ws", graft.ops.TextHashing.words(col("text")))
        .filter(size(col("ws")) > 0)
        .select(col("source"),
          explode(graft.ops.TextDedup.ngramsOf(col("ws"), n)).as("gram")),
      m)
}
