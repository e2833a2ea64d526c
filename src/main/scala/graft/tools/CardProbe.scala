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
      val stor = spark.sparkContext.getRDDStorageInfo
        .filter(_.numCachedPartitions > 0)
        .map(r => s"rdd${r.id}:${r.numCachedPartitions}p/${r.memSize / 1048576}MB")
      println(s"    storage: ${stor.mkString(" ")}")
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
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        private val n = new java.util.concurrent.atomic.AtomicInteger()
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val plan = qe.executedPlan.toString
          val imr = plan.linesIterator.count(_.contains("InMemory"))
          val f = s"/tmp/cardplan_${n.incrementAndGet()}_$funcName.txt"
          java.nio.file.Files.writeString(java.nio.file.Paths.get(f), plan)
          System.err.println(
            f"[qe] $funcName ${durationNs / 1e9}%.2f s InMemory-lines=$imr -> $f")
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ex: Exception): Unit = ()
      })
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val secs = (for {a <- i.completionTime; b <- i.submissionTime}
            yield (a - b) / 1e3).getOrElse(-1.0)
          if (secs > 0.5) {
            val m = i.taskMetrics
            System.err.println(
              f"[stage] ${i.stageId}%4d $secs%7.2f s tasks=${i.numTasks}%4d " +
                f"cpu=${m.executorCpuTime / 1e9}%.1f run=${m.executorRunTime / 1e3}%.1f " +
                f"gc=${m.jvmGCTime / 1e3}%.1f spill=${m.memoryBytesSpilled / 1048576}MB " +
                f"shr=${m.shuffleReadMetrics.totalBytesRead / 1048576}MB " +
                f"shw=${m.shuffleWriteMetrics.bytesWritten / 1048576}MB " +
                i.rddInfos.filter(r => r.name.contains("FileScan") || r.name.contains("Adaptive"))
                  .map(r => s"rdd${r.id}=${r.name.take(20)}").mkString(" "))
          }
        }
      })
    timed("card-count-again") { graft.ops.TextAnalysis.datasetCard(spark, dir).count() }
    (1 to 2).foreach { i =>
      timed(s"card-noop-rep$i") {
        graft.ops.TextAnalysis.datasetCard(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println("    minhash_clusters cached = " +
          graft.core.SessionCache.contains(spark, "minhash_clusters", dir))
        0L
      }
    }
    // discriminators: does the noop write defeat the cache on (a) the
    // bare cached table, (b) a single-join consumer, or only (c) the
    // twice-referencing card?
    timed("clusters-noop") {
      graft.ops.TextDedup.minhashClusters(spark, dir)
        .write.format("noop").mode("overwrite").save(); 0L
    }
    timed("keepbest-noop") {
      graft.ops.TextDedup.dedupKeepBest(spark, dir)
        .write.format("noop").mode("overwrite").save(); 0L
    }
    timed("keepbest-count") { graft.ops.TextDedup.dedupKeepBest(spark, dir).count() }
    spark.stop()
  }
}
