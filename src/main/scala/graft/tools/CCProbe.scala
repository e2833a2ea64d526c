package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing probe for the cluster-dedup fixpoint: wall-clock per stage and
  * Spark job counts for each cluster query at a given SF dir. Dev tool —
  * not part of the query surface.
  *
  *   sbt "runMain graft.tools.CCProbe [sfDir]"
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftConf.tuned(
      SparkSession.builder().master(s"local[$cores]").appName("ccprobe"), cores)
      .getOrCreate()
    graft.core.GraftConf.runtime(spark)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def timed(name: String)(f: => Long): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] $name%-28s ${sec}%6.2f s  jobs=${jobs.get() - j0}%3d  rows=$n")
    }
    // warm the session caches the same way Bench's min-of-3 does
    timed("simhash_pairs_warm") { graft.ops.TextDedup.simhash(spark, dir).count() }
    timed("simhash_clusters") { graft.ops.TextDedup.simhashClusters(spark, dir).count() }
    timed("simhash_clusters_2") { graft.ops.TextDedup.simhashClusters(spark, dir).count() }
    timed("minhash_pairs_warm") { graft.ops.TextDedup.minhashLsh(spark, dir).count() }
    timed("minhash_clusters") { graft.ops.TextDedup.minhashClusters(spark, dir).count() }
    timed("minhash_clusters_2") { graft.ops.TextDedup.minhashClusters(spark, dir).count() }
    spark.stop()
  }
}
