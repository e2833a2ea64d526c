package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Output-shape smoke for the SimHash dedup family: replicates the corpus
  * k-fold with near-identical replicas (every replica IS a true near-dup
  * of its original — the adversarial case for dedup), then compares how
  * the two output contracts grow:
  *
  *  - `dedup_simhash` (all pairs): m-doc cluster emits m(m-1)/2 rows —
  *    quadratic in cluster size, so k-fold replication grows output ~k^2.
  *  - `dedup_simhash_clusters` (doc_id, cluster_rep): m-doc cluster emits
  *    m rows — linear, so k-fold replication grows output ~k.
  *
  * Results recorded in docs/SCALING.md. Usage:
  *   sbt "runMain graft.tools.ClusterSmoke [srcSfDir] [factor]"
  */
object ClusterSmoke {

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val factor = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicated(k: Int): String = {
      val out = java.nio.file.Files.createTempDirectory(s"clsmoke$k").toString
      val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      (0 until k).map { i =>
        val d = docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        if (i == 0) d else d.withColumn("text", concat(col("text"), lit(s" replica$i")))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      out
    }

    def measure(dir: String): (Long, Double, Long, Double) = {
      val t0 = System.nanoTime()
      val nPairs = graft.ops.TextDedup.simhash(spark, dir).count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nClusters = graft.ops.TextDedup.simhashClusters(spark, dir).count()
      val tClusters = (System.nanoTime() - t1) / 1e9
      (nPairs, tPairs, nClusters, tClusters)
    }

    val d1 = replicated(1)
    val dk = replicated(factor)
    val (p1, tp1, c1, tc1) = measure(d1)
    val (pk, tpk, ck, tck) = measure(dk)
    println(f"${"output"}%-22s ${"1x"}%10s ${s"${factor}x"}%10s ${"growth"}%8s  (docs x$factor, near-identical replicas)")
    println(f"${"simhash pair rows"}%-22s $p1%10d $pk%10d ${pk.toDouble / p1}%7.1fx")
    println(f"${"simhash cluster rows"}%-22s $c1%10d $ck%10d ${ck.toDouble / c1}%7.1fx")
    println(f"${"pair seconds"}%-22s $tp1%10.2f $tpk%10.2f ${tpk / tp1}%7.1fx")
    println(f"${"cluster seconds"}%-22s $tc1%10.2f $tck%10.2f ${tck / tc1}%7.1fx")
    spark.stop()
  }
}
