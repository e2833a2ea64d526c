package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 measurement (VERDICT r16 #6): the wide-phash incremental
  * gate's cost at an ELEVATED real-image fraction. The mixed faces pin
  * 1% real images (den=100); the gate's cost model (decode-once,
  * band-join) had no measured point at 10%+ — this times the full
  * `media_curation_replay_mixed` replay at den=100 then den=10 in one
  * JVM (separate cache keys, so each pays its own decode), giving the
  * decode-fraction scaling row SCALING.md needs.
  *
  *   scripts/run_main.sh graft.tools.MediaFracProbe /tmp/graft_sf1
  */
object MediaFracProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    graft.core.GraftConf.privateLocalDirs()
    val spark = graft.core.GraftConf.tuned(
      SparkSession.builder().master(s"local[$cores]").appName("mediafrac"), cores)
      .getOrCreate()
    graft.core.GraftConf.runtime(spark)
    spark.sparkContext.setLogLevel("WARN")

    def run(den: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.ops.CurationPipeline.mediaCurationReplayMixed(spark, dir, 6, den).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val results = Seq(100, 10).map { den =>
      val (sec, rows) = run(den)
      println(f"[mediafrac] den=$den%-4d (${100.0 / den}%.0f%% real images)  $sec%8.2f s  rows=$rows")
      (den, sec, rows)
    }
    val line = "{\"metric\":\"media_mixed_fraction\",\"unit\":\"sec\"," +
      results.map { case (den, sec, rows) =>
        f""""den$den":{"sec":$sec%.3f,"rows":$rows}""" }.mkString(",") +
      s""","sf":"$dir"}"""
    println(line)
    sys.env.get("GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop()
  }
}
