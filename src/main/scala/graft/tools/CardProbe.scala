package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 diagnostic for the `dataset_card` sf10 riser (VERDICT r16
  * "What's wrong" #1: 23.0 s r14 -> 32.7 s r15 -> 39.2 s r16, solo,
  * healthy canary both rounds — so NOT environmental). The card is one
  * composed plan over four operator legs; this times each leg SOLO in
  * a fresh cache state, then the composed card (warm caches), then a
  * second composed run (fully warm) — whichever leg grew names the
  * regression.
  *
  *   scripts/run_main.sh graft.tools.CardProbe /tmp/graft_sf10
  */
object CardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    graft.core.GraftConf.privateLocalDirs()
    val spark = graft.core.GraftConf.tuned(
      SparkSession.builder().master(s"local[$cores]").appName("cardprobe"), cores)
      .getOrCreate()
    graft.core.GraftConf.runtime(spark)
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[card] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // leg order matches datasetCard's composition; each leg's count
    // also warms the session caches the composed run reuses, so the
    // composed timing at the end isolates the card's OWN work
    timed("withQuality(scan)") {
      graft.ops.TextAnalysis.qualityScore(spark, dir).count()
    }
    timed("langId") { graft.ops.TextAnalysis.langId(spark, dir).count() }
    timed("minhashClusters") { graft.ops.TextDedup.minhashClusters(spark, dir).count() }
    timed("decontamination") { graft.ops.TextDedup.decontamination(spark, dir).count() }
    timed("datasetCard(warm)") { graft.ops.TextAnalysis.datasetCard(spark, dir).count() }
    timed("datasetCard(warm2)") { graft.ops.TextAnalysis.datasetCard(spark, dir).count() }
    // bench-identical reps: a FRESH plan each time, materialized through
    // the noop write exactly like Bench.runOnce — if these are slow
    // while the counts above are fast, the cache works and the bench's
    // action/plan shape is what recomputes
    (1 to 3).foreach { i =>
      timed(s"card-noop-rep$i") {
        graft.ops.TextAnalysis.datasetCard(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println("    minhash_clusters cached = " +
          graft.core.SessionCache.contains(spark, "minhash_clusters", dir))
        0L
      }
    }
    spark.stop()
  }
}
