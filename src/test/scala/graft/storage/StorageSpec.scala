package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write-once-shuffle-never layout for hot
  * fact-to-fact joins (SURVEY §7.4.6). */
class StorageSpec extends SparkSpec {

  test("same-bucketed tables join with no shuffle exchange") {
    import spark.implicits._
    val ticks = (1 to 1000).map(i => (s"tok${i % 50}", i.toLong, i * 1.5))
      .toDF("token", "seq", "price")
    val stats = (0 until 50).map(i => (s"tok$i", i * 10L))
      .toDF("token", "score")

    TickTable.saveBucketed(ticks, "bkt_ticks", "token", 8)
    TickTable.saveBucketed(stats, "bkt_stats", "token", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join strategy actually exercises the layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_ticks").join(spark.table("bkt_stats"), "token")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === 1000)
      // correctness of the co-located result
      val r = joined.filter(col("token") === "tok7")
        .agg(count(lit(1)), max("score")).head()
      assert(r.getLong(0) === 20L)
      assert(r.getLong(1) === 70L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_ticks")
      spark.sql("DROP TABLE IF EXISTS bkt_stats")
    }
  }

  test("appendBatch spreads a single-date batch across bounded writer tasks, each time-sorted") {
    import spark.implicits._
    // the r15 sustained-ingest finding: a LIVE stream's rows all carry
    // today's date, so repartition-by-date-alone serialized every batch
    // into one writer task. The spread must (a) produce >1 but
    // <= WritersPerDate files for a hot date, (b) keep every file
    // time-sorted (the MergeTree parts analog), (c) stay idempotent
    // under batch replay.
    val dir = java.nio.file.Files.createTempDirectory("abspread").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val ticks = (1 to 4000).map { i =>
      (s"tok${i % 97}", i.toLong,
        new java.sql.Timestamp(ts0.getTime + (i * 7919) % 3600000))
    }.toDF("token", "sequence_number", "exchange_timestamp")
    TickTable.appendBatch(ticks, dir, batchId = 3L)
    val part = new java.io.File(dir, "trade_date=2024-01-05/batch_id=3")
    val files = part.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "a hot date must not serialize into one writer")
    assert(files.length <= TickTable.WritersPerDate,
      s"files per batch per date bounded by WritersPerDate: ${files.length}")
    files.foreach { f =>
      val ts = spark.read.parquet(f.getAbsolutePath)
        .select("exchange_timestamp").as[java.sql.Timestamp].collect()
      assert(ts.sameElements(ts.sorted),
        s"each part file must be time-sorted: ${f.getName}")
    }
    // token rows cluster into one file (point-lookup locality)
    val tokFiles = files.map { f =>
      spark.read.parquet(f.getAbsolutePath)
        .filter(col("token") === "tok7").count()
    }
    assert(tokFiles.count(_ > 0) === 1, "one token's rows live in one bucket file")
    // replayed batch overwrites its own partition dir, no duplication
    // (runs LAST: the overwrite replaces the files listed above)
    TickTable.appendBatch(ticks, dir, batchId = 3L)
    assert(spark.read.parquet(dir).count() === 4000L)
  }

  test("append (batch face) spreads hot dates across bounded writers, scaled by distinct dates") {
    import spark.implicits._
    // r15 verdict "what's wrong" #1: append() kept the column-only
    // repartition whose small shuffle outputs AQE coalesces back into
    // ONE writer task — the serialization appendBatch fixed in r15.
    // Pin the batch face too: (a) a hot date produces >1 but
    // <= WritersPerDate files, (b) a multi-date backfill keeps that
    // per-date bound for EVERY date (writers scale by distinct dates).
    val dir = java.nio.file.Files.createTempDirectory("apspread").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    def day(d: Int) = ts0.getTime + d * 86400000L
    val backfill = (1 to 8000).map { i =>
      (s"tok${i % 97}", i.toLong,
        new java.sql.Timestamp(day(i % 2) + (i * 7919) % 3600000))
    }.toDF("token", "sequence_number", "exchange_timestamp")
    TickTable.append(backfill, dir)
    Seq("2024-01-05", "2024-01-06").foreach { d =>
      val part = new java.io.File(dir, s"trade_date=$d")
      val files = part.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length > 1, s"hot date $d must not serialize into one writer")
      assert(files.length <= TickTable.WritersPerDate,
        s"files per date bounded by WritersPerDate: $d had ${files.length}")
      files.foreach { f =>
        val ts = spark.read.parquet(f.getAbsolutePath)
          .select("exchange_timestamp").as[java.sql.Timestamp].collect()
        assert(ts.sameElements(ts.sorted),
          s"each part file must be time-sorted: $d/${f.getName}")
      }
    }
    assert(spark.read.parquet(dir).count() === 8000L)
  }

  test("compactBatchDirs merges cold batches, keeps the hot one, repeats safely") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cbd").toString
    def writeBatch(id: Long, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").withColumn("batch_id", lit(id))
        .write.mode("append").partitionBy("batch_id").parquet(dir)
    def batchIds() = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).sorted.toSeq
    writeBatch(0, Seq((1L, "a"), (2L, "b")))
    writeBatch(1, Seq((3L, "c")))
    writeBatch(2, Seq((4L, "d")))
    Compaction.compactBatchDirs(spark, dir, keepRecent = 1)
    assert(batchIds() === Seq(-1L, 2L), "cold 0,1 merged; hot 2 untouched")
    assert(spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 4L))
    Compaction.compactBatchDirs(spark, dir, keepRecent = 1)
    assert(batchIds() === Seq(-1L, 2L), "re-compaction with nothing to merge is a no-op")
    writeBatch(3, Seq((5L, "e")))
    Compaction.compactBatchDirs(spark, dir, keepRecent = 1)
    assert(batchIds() === Seq(-2L, 3L), "prior compaction output is cold and re-merged")
    assert(spark.read.parquet(dir).count() === 5)
  }

  test("interrupted compaction rolls forward from the journal, never recompacts duplicates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cjr").toString
    Seq((1L, "a")).toDF("id", "v").withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(dir)
    Seq((2L, "b")).toDF("id", "v").withColumn("batch_id", lit(1L))
      .write.mode("append").partitionBy("batch_id").parquet(dir)
    // crash simulation: staging fully written, manifest journaled, but
    // neither publish nor deletes executed
    val staging = s"$dir/.compact_stage"
    spark.read.parquet(dir).drop("batch_id").repartition(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/.compact_manifest"),
      (s"publish\t$staging\t$dir/batch_id=-1\n" +
        s"delete\t$dir/batch_id=0\ndelete\t$dir/batch_id=1\n").getBytes("UTF-8"))
    Compaction.recover(spark, dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).sorted
    assert(dirs.toSeq === Seq("batch_id=-1"), s"journal must roll forward, got ${dirs.toSeq}")
    assert(spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("a staging dir without a manifest is an aborted attempt: discarded, originals intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cab").toString
    Seq((1L, "a")).toDF("id", "v").withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(dir)
    spark.read.parquet(dir).drop("batch_id")
      .write.mode("overwrite").parquet(s"$dir/.compact_stage")
    Compaction.recover(spark, dir)
    assert(!new java.io.File(s"$dir/.compact_stage").exists(), "pre-journal stage discarded")
    assert(spark.read.parquet(dir).count() === 1, "originals untouched")
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    import spark.implicits._
    val a = (1 to 100).map(i => (s"k${i % 10}", i)).toDF("token", "x")
    val b = (0 until 10).map(i => (s"k$i", i)).toDF("token", "y")
    TickTable.saveBucketed(a, "bkt_a", "token", 8)
    TickTable.saveBucketed(b, "bkt_b", "token", 3)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "token")
      assert(joined.count() === 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("z-ordered layout clusters BOTH dimensions; time-sort clusters only time") {
    import spark.implicits._
    // 64 tokens x 256 minutes, shuffled arrival order
    val rows = new scala.util.Random(42).shuffle(
      (for (tok <- 0 until 64; m <- 0 until 256) yield (tok.toLong, m.toLong))
        .toVector)
      .zipWithIndex.map { case ((t, m), i) => (i.toLong, t, m) }
    val df = rows.toDF("event_id", "token", "minute")
    val zdir = java.nio.file.Files.createTempDirectory("zord").toString
    val tdir = java.nio.file.Files.createTempDirectory("tsort").toString
    TickTable.saveZOrdered(df, zdir, col("token"), col("minute"), numFiles = 16)
    df.repartitionByRange(16, col("minute")).sortWithinPartitions("minute")
      .write.mode("overwrite").parquet(tdir)

    def medianSpans(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("token") - min("token")).as("ts"),
          (max("minute") - min("minute")).as("ms"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      def med(xs: Seq[Long]) = xs.sorted.apply(xs.length / 2).toDouble
      (med(spans.map(_._1).toSeq), med(spans.map(_._2).toSeq))
    }
    val (zTok, zMin) = medianSpans(zdir)
    val (sTok, sMin) = medianSpans(tdir)
    // time-sorted: minute span tiny per file, token span ~full (63)
    assert(sMin < 64 && sTok > 48, s"time-sort layout: tok=$sTok min=$sMin")
    // z-ordered: BOTH spans a fraction of their full ranges — a filter
    // on EITHER dimension prunes most files via footer min/max
    assert(zTok <= 48 && zMin <= 128,
      s"z-order must bound both dims: tok=$zTok min=$zMin")
  }
}
