package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Measures what quantizer STALENESS costs an appended composed index —
  * the number behind docs/SCALING.md's "staleness costs recall, never
  * correctness" claim, on the adversarial drift shape: the appended
  * batches introduce blobs the base quantizer never saw, so their
  * vectors land in whatever old cluster is nearest and a low-nprobe
  * probe may miss them.
  *
  * Protocol (deterministic end to end): 16-blob clustered corpus;
  * base = blobs 0-11 (vec_id % 16 < 12), appended = blobs 12-15.
  * Recall@5 at nprobe=2/4 for queries from OLD blobs and from NEW
  * (appended) blobs, against brute-force truth over the full corpus —
  * then the same after a full REBUILD (fresh quantizers that have seen
  * everything). Usage:
  *   sbt "runMain graft.tools.AppendDriftProbe [n] [blobs]"
  */
object AppendDriftProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000L
    val blobs = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = java.nio.file.Files.createTempDirectory("driftall").toString
    val idx = java.nio.file.Files.createTempDirectory("driftidx").toString
    def corpus = SyntheticEmbeddings.clustered(spark, n, blobs, sigma = 0.2)
    val baseBlobs = blobs * 3 / 4
    SyntheticEmbeddings.write(spark, all, corpus)
    // RESIDUAL layout throughout: raw-PQ codes collapse to ~0 recall on
    // clustered data (docs/SCALING.md blob table), which would drown
    // the staleness signal this probe exists to isolate
    // build the index while only the base blobs exist...
    SyntheticEmbeddings.write(spark, idx, corpus.filter(col("vec_id") % blobs < baseBlobs))
    Similarity.buildIvfPqIndex(spark, idx, residual = true)
    // ...then the corpus grows (embeddings file swaps to the full set —
    // the persisted index files are untouched, exactly the
    // index-built-before-the-data-arrived timeline) and the new blobs
    // arrive as an append coded under the STALE quantizers
    SyntheticEmbeddings.write(spark, idx, corpus)
    Similarity.appendToIvfPqIndex(spark, idx,
      corpus.filter(col("vec_id") % blobs >= baseBlobs), batchId = 1)

    // deterministic query sets: first 32 ids of old blobs, first 32 of new
    val oldQ = (0L until n).filter(_ % blobs < baseBlobs).take(32)
    val newQ = (0L until n).filter(_ % blobs >= baseBlobs).take(32)

    def measure(tag: String): Unit =
      for ((qtag, qids) <- Seq("old-blob queries" -> oldQ, "NEW-blob queries" -> newQ)) {
        val truth = Similarity.bruteForceTopKFor(spark, all, qids, 5)
        truth.persist().count()
        for ((nprobe, sl) <- Seq(2 -> 40, 4 -> 80)) {
          val r = Similarity.recallAtK(
            Similarity.ivfPqResidualTopKFor(spark, idx, qids, 5, nprobe, sl), truth)
          println(f"$tag%-18s $qtag%-18s nprobe=$nprobe sl=$sl  recall@5 = $r%.3f")
        }
        truth.unpersist()
        ()
      }

    measure("appended (stale)")
    // the maintenance answer: a rebuild's quantizers have seen the new
    // blobs — same data, fresh centroids/codebooks
    Similarity.buildIvfPqIndex(spark, idx, residual = true)
    measure("rebuilt (fresh)")
    spark.stop()
  }
}
