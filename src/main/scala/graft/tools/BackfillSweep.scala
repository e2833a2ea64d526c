package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 measurement (VERDICT r16 #8, stretch): the
  * GRAFT_WRITERS_PER_DATE conf key landed in r16 with spec cover but
  * no measured sweep. This times one multi-date batch backfill through
  * `TickTable.append` at the CURRENT WritersPerDate (the key is read
  * at object init, so each sweep point is its own JVM — the driving
  * script sets the env and calls this twice) and reports wall, rows/s,
  * and the per-date file counts the spread law promises.
  *
  *   GRAFT_WRITERS_PER_DATE=8 scripts/run_main.sh graft.tools.BackfillSweep /tmp/bf8 20000000 5
  */
object BackfillSweep {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_backfill_sweep")
    val rows = args.lift(1).map(_.toLong).getOrElse(20_000_000L)
    val days = args.lift(2).map(_.toInt).getOrElse(5)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    graft.core.GraftConf.privateLocalDirs()
    val spark = graft.core.GraftConf.tuned(
      SparkSession.builder().master(s"local[$cores]").appName("backfillsweep"), cores)
      .getOrCreate()
    graft.core.GraftConf.runtime(spark)
    spark.sparkContext.setLogLevel("WARN")

    // synthetic multi-date backfill: tick-shaped columns derived from
    // spark.range (distributed generation — nothing driver-sized)
    val base = java.sql.Timestamp.valueOf("2024-01-01 09:00:00").getTime
    val ticks = spark.range(rows)
      .select(
        concat(lit("tok"), (col("id") % 2000)).as("token"),
        col("id").as("sequence_number"),
        timestamp_millis(lit(base) + (col("id") % days) * 86400000L +
          (col("id") * 7919L) % 21600000L).as("exchange_timestamp"),
        (rand(42) * 1000).as("last_traded_price"))

    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete(); ()
    }
    rmRf(new java.io.File(out))
    val t0 = System.nanoTime()
    graft.storage.TickTable.append(ticks, out)
    val wall = (System.nanoTime() - t0) / 1e9

    val perDate = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("trade_date="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .sortBy(_._1)
    perDate.foreach { case (d, n) => println(s"[backfill] $d files=$n") }
    val line =
      s"""{"metric":"backfill_append","writers_per_date":${graft.storage.TickTable.WritersPerDate},""" +
        f""""rows":$rows,"days":$days,"wall_sec":$wall%.3f,"rows_per_sec":${rows / wall}%.0f,""" +
        s""""files_per_date":[${perDate.map(_._2).mkString(",")}]}"""
    println(line)
    sys.env.get("GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop()
  }
}
