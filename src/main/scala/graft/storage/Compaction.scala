package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Manifest-journaled compaction primitives shared by the tick table and
  * the streaming-dedup sinks (corpus + fingerprint index).
  *
  * Protocol (publish-then-delete, never delete-then-publish):
  *   1. write the compacted copy to a dot-prefixed staging dir
  *      (invisible to readers);
  *   2. journal the intent — an atomic manifest (write tmp, rename into
  *      place) listing every publish rename and every delete;
  *   3. execute the publish renames, CHECKING each boolean result
  *      (Hadoop FileSystem.rename reports most failures by returning
  *      false, not throwing) — a failed rename aborts with the originals
  *      untouched and the manifest left for recovery;
  *   4. execute the deletes; 5. remove the manifest.
  *
  * Crash anywhere: `recover` rolls the journal FORWARD — staged data is
  * complete by the time the manifest exists (the manifest is written
  * after the staging write finishes), so recovery finishes the publishes
  * and deletes instead of recompacting over a half-published partition
  * (which would bake the transient duplicates into the table). A staging
  * dir with no manifest is an aborted attempt and is discarded. The only
  * reader-visible anomaly in any crash window is transient duplication
  * (rows in both the old dirs and the published copy), which recovery
  * removes; no window loses data. */
object Compaction {

  private[graft] def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestOf(dir: String) = new Path(dir, ".compact_manifest")
  private def manifestTmpOf(dir: String) = new Path(dir, ".compact_manifest.tmp")
  private[graft] def stagingOf(dir: String) = new Path(dir, ".compact_stage")

  /** Roll an interrupted compaction of `dir` forward (finish publishes +
    * deletes), then discard any manifest-less staging leftovers. Called
    * on entry by every compaction; safe to call any time. */
  def recover(spark: SparkSession, dir: String): Unit =
    recover(fsFor(spark, dir), dir)

  private[storage] def recover(fs: FileSystem, dir: String): Unit = {
    val mf = manifestOf(dir)
    if (fs.exists(mf)) {
      val in = fs.open(mf)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines.foreach {
        _.split('\t') match {
          case Array("publish", src, dst) =>
            val (s, d) = (new Path(src), new Path(dst))
            if (fs.exists(s) && !fs.exists(d) && !fs.rename(s, d))
              throw new java.io.IOException(
                s"compaction recovery: publish rename failed: $s -> $d")
          case Array("delete", path) =>
            val p = new Path(path)
            if (fs.exists(p)) fs.delete(p, true)
          case _ => ()
        }
      }
      fs.delete(mf, false)
    }
    // tmp manifest = crash before the journal became effective; staging
    // with no manifest = aborted attempt. Both are pre-publish: discard.
    if (fs.exists(manifestTmpOf(dir))) fs.delete(manifestTmpOf(dir), false)
    if (fs.exists(stagingOf(dir))) fs.delete(stagingOf(dir), true)
  }

  /** Journal then execute: publishes (src -> dst renames) before deletes,
    * every rename result checked. On a failed publish the originals are
    * intact and the manifest stays for `recover` to retry/finish. */
  private[storage] def publishAndClean(
      fs: FileSystem, dir: String,
      publishes: Seq[(String, String)], deletes: Seq[String]): Unit = {
    val mf = manifestOf(dir)
    val tmp = manifestTmpOf(dir)
    val lines = publishes.map { case (s, d) => s"publish\t$s\t$d" } ++
      deletes.map(d => s"delete\t$d")
    val out = fs.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, mf)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"compaction journal rename failed: $tmp -> $mf")
    }
    publishes.foreach { case (s, d) =>
      if (!fs.rename(new Path(s), new Path(d)))
        throw new java.io.IOException(
          s"compaction publish rename failed: $s -> $d (originals untouched; manifest kept for recover)")
    }
    deletes.foreach(d => fs.delete(new Path(d), true))
    fs.delete(mf, false)
  }

  /** Collapse batch_id=N partition dirs under `dir` into one fresh
    * NEGATIVE batch_id dir (layout-preserving: partition discovery and
    * idempotent batch appends keep working; a fresh negative id per
    * compaction never collides with a replayed positive id).
    *
    * `keepRecent` leaves the highest non-negative ids untouched: a
    * checkpointed streaming sink can only ever replay its most recent
    * uncommitted batch, so everything older is immutable and safe to
    * merge — and the replayable hot batch keeps its own partition for
    * dynamic-overwrite idempotence. Thousands of micro-batch dirs on the
    * index read path collapse to one. */
  def compactBatchDirs(spark: SparkSession, dir: String, keepRecent: Int = 0,
      numFiles: Int = 1, sortCol: Option[String] = None): Unit = {
    val fs = fsFor(spark, dir)
    recover(fs, dir)
    if (!fs.exists(new Path(dir))) return
    val ids = fs.listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).toSeq.sorted
    val hot = ids.filter(_ >= 0).takeRight(keepRecent).toSet
    val cold = ids.filterNot(hot)
    // nothing to merge: no cold dirs, or just the previous compaction's own output
    if (cold.isEmpty || (cold.size == 1 && cold.head < 0)) return
    val coldDirs = cold.map(id => s"$dir/batch_id=$id")
    val rows = spark.read.option("basePath", dir)
      .parquet(coldDirs: _*).drop("batch_id")
    val staging = stagingOf(dir).toString
    val repart = rows.repartition(numFiles)
    sortCol.fold(repart)(c => repart.sortWithinPartitions(c))
      .write.mode("overwrite").parquet(staging)
    val newId = math.min(ids.min, 0L) - 1
    publishAndClean(fs, dir,
      Seq(staging -> s"$dir/batch_id=$newId"), coldDirs)
  }
}
