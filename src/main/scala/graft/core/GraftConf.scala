package graft.core

import org.apache.spark.sql.SparkSession

/** Recommended session configuration, local-mode and cluster-scale.
  *
  * The same code runs in both; only these knobs move. Values follow the
  * sizing rules in SURVEY §7.4.6 / the Spark tuning guide: shuffle
  * partitions ~ 2-3x total cores (AQE coalesces down), 128 MB scan
  * splits, AQE on with skew-join splitting, small dims broadcast.
  */
object GraftConf {

  /** Apply to a builder before getOrCreate. `cores` = total executor
    * cores (32 for the local harness; thousands on a real cluster). */
  def tuned(builder: SparkSession.Builder, cores: Int): SparkSession.Builder =
    builder
      // ~2x cores per the class sizing rule: AQE can only COALESCE
      // partitions, never split non-skewed ones, so start high
      .config("spark.sql.shuffle.partitions", (math.max(cores, 1) * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // RDD-side shuffles (the contraction fixpoint) serialize Long-pair
      // tuples: Kryo is ~2-3x leaner than Java serialization there; the
      // SQL path is unaffected (Tungsten rows have their own format)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Create every configured Spark local (spill) directory before the
    * session starts. Round 12's official driver bench died 143/149 with
    * `FileNotFoundException: /tmp/spark-local/...` because a benchmark
    * script exported `SPARK_LOCAL_DIRS` and deleted the directory on
    * exit — the stale env var then pointed a LATER Spark launch at a
    * spill dir that no longer existed. One mkdirs at startup makes the
    * whole class of stale-env failures impossible. Honors the same
    * precedence Spark's Utils.getConfiguredLocalDirs does for local
    * mode: SPARK_LOCAL_DIRS env, else spark.local.dir system property
    * (comma-separated lists in both). */
  def ensureLocalDirs(): Unit = {
    val dirs = sys.env.get("SPARK_LOCAL_DIRS")
      .orElse(sys.props.get("spark.local.dir"))
      .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    dirs.foreach { d =>
      val f = new java.io.File(d)
      if (!f.isDirectory && !f.mkdirs() && !f.isDirectory)
        throw new java.io.IOException(
          s"Spark local dir '$d' (from SPARK_LOCAL_DIRS/spark.local.dir) " +
            "does not exist and could not be created — fix the env before " +
            "launching, or every shuffle spill will fail mid-query")
    }
  }

  /** Fail fast when the heap is provably short for a timing run over
    * `sfDir` (round-12 verdict #8: the sf100 disk-full crash took hours
    * to surface because nothing checked headroom up front). Measured
    * floors (docs/SCALING.md): the suite runs comfortably at ~6x the
    * corpus's on-disk parquet bytes (sf100: 16 GB parquet -> 96 GB
    * heap) and a run below ~2x is known-unviable (parquet decompresses
    * 3-10x and the heavy plans persist intermediate frames) — so < 2x
    * throws with the floor in the message, < 6x warns. Override with
    * GRAFT_IGNORE_HEAP=1 for deliberate spill experiments. */
  def checkBenchHeadroom(sfDir: String): Unit = {
    val root = new java.io.File(sfDir)
    if (!root.isDirectory) return
    def bytesOf(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(bytesOf).sum).getOrElse(0L)
      else if (f.getName.endsWith(".parquet")) f.length()
      else 0L
    val bytes = bytesOf(root)
    val heap = Runtime.getRuntime.maxMemory()
    def gb(x: Long): String = f"${x / 1e9}%.1f GB"
    if (heap < 2L * bytes && !sys.env.contains("GRAFT_IGNORE_HEAP"))
      throw new IllegalStateException(
        s"heap ${gb(heap)} is provably short for $sfDir (${gb(bytes)} " +
          s"on-disk parquet; measured floor ~6x, hard floor 2x — see " +
          s"docs/SCALING.md): set SPARK_DRIVER_MEM >= ${gb(6L * bytes)} " +
          "or GRAFT_IGNORE_HEAP=1 for a deliberate spill experiment")
    else if (heap < 6L * bytes)
      System.err.println(
        s"[graft] WARN heap ${gb(heap)} below the measured ~6x floor for " +
          s"$sfDir (${gb(bytes)} parquet) — heavy queries may spill or die; " +
          s"measured floors in docs/SCALING.md")
  }

  /** Runtime SQL confs that must hold for the engine's readers, applied to
    * an already-built session (builder-time configs don't reach reused
    * sessions). `nanosAsLong`: the driver's events.parquet stores ts as
    * TIMESTAMP(NANOS), which Spark 4 only reads via this escape hatch —
    * a session-wide reader setting, deliberately NOT toggled inside query
    * functions (a query silently flipping session state is a footgun for
    * concurrent callers). */
  def runtime(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** 100 TB notes (not settable from inside the job, documented here):
    *  - shuffle partitions: target ~128-256 MB per reduce partition;
    *    at 100 TB of input and ~1 TB of post-filter shuffle, thousands of
    *    partitions — set spark.sql.shuffle.partitions high and let AQE
    *    coalesce, never the reverse;
    *  - tick table: partition by trade_date (this library does), bucket
    *    very hot fact-to-fact joins by token if they appear;
    *  - broadcast threshold: the token directory and centroid tables are
    *    KB-scale — the explicit broadcast() calls in this library don't
    *    depend on autoBroadcastJoinThreshold;
    *  - dedup/similarity: shingle and band tables should be persisted
    *    (DISK_ONLY) when reused across queries of one session.
    */
  val clusterNotes: String = "see scaladoc"
}
