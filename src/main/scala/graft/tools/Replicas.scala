package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE k-fold near-dup replication contract shared by every smoke/probe
  * tool (ClusterSmoke, PpjoinProbe, CurationSmoke): replica i of a row
  * keeps its payload except for a tiny deterministic mutation (a suffix
  * token for text, a scale factor for vectors), so every replica is a
  * TRUE near-dup of its original — the adversarial shape for the dedup
  * gates — and ids offset by i * IdStride. One implementation so the
  * corpora the tools measure stay comparable (docs/SCALING.md cites
  * them side by side). */
object Replicas {

  /** Replica id offset per fold. Source ids must stay below this. */
  val IdStride = 10000000L

  /** k-fold documents: replica i appends " replica{i}" to the text. */
  def docs(src: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      val d = src.withColumn("doc_id", col("doc_id") + lit(i * IdStride))
      if (i == 0) d else d.withColumn("text", concat(col("text"), lit(s" replica$i")))
    }.reduce(_ unionByName _)

  /** k-fold embeddings: replica i scales the vector by (1 + i/100) —
    * colinear with its original, cosine 1. */
  def vecs(src: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      val d = src.withColumn("vec_id", col("vec_id") + lit(i * IdStride))
      if (i == 0) d
      else d.withColumn("embedding", transform(col("embedding"), x => x * lit(1.0f + i * 0.01f)))
    }.reduce(_ unionByName _)
}
