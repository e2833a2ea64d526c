package graft.core

import org.apache.spark.sql.SparkSession

/** Hadoop-FS one-liners shared by the persisted-index operators. */
object Fs {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Total bytes under a path (0 when absent) — the metadata-only scale
    * estimate that session-cache gates ride; never a data scan. */
  def sizeBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Move a staged directory into place. NOT assumed atomic (object
    * stores aren't) — callers ride the marker discipline for crash
    * safety, the rename only avoids a second data copy. */
  def rename(spark: SparkSession, from: String, to: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(from)
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(f, new org.apache.hadoop.fs.Path(to))
  }
}
