package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialized-table cache — the one implementation of
  * the "compute once per (session, dir), persist, reuse across queries"
  * pattern (shingle index, simhash signatures, multimodal features,
  * normed embedding corpus).
  *
  * Materialization is EAGER (one count() at build): lazy materialization
  * lets several subtrees of the first query race into the unmaterialized
  * cache and lets later queries plan against pre-materialization stats
  * (observed as bimodal timings). Entries are keyed by (session, kind,
  * dir) and live until invalidated — callers that rewrite the underlying
  * files mid-session must call `invalidate` (documented on each cached
  * accessor); `clear(spark)` drops a whole session's entries, e.g.
  * before spark.stop().
  */
object SessionCache {

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def getOrBuild(spark: SparkSession, kind: String, dir: String)(
      build: => DataFrame): DataFrame =
    tables.computeIfAbsent((spark, kind, dir), { _ =>
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })

  /** Drop one entry (unpersists). Call after rewriting `dir`'s files. */
  def invalidate(spark: SparkSession, kind: String, dir: String): Unit = {
    val df = tables.remove((spark, kind, dir))
    if (df != null) df.unpersist(blocking = false)
  }

  /** Drop every entry of a session (before spark.stop()). */
  def clear(spark: SparkSession): Unit = {
    val it = tables.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._1 eq spark) {
        val df = tables.remove(k)
        if (df != null) df.unpersist(blocking = false)
      }
    }
  }
}
