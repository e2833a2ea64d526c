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

  /** Cleanup callbacks fired when a watched session's application ends —
    * other session-keyed caches (e.g. TextDedup's shingle indexes)
    * register here so one listener evicts everything and no stopped
    * session stays pinned for the JVM lifetime. */
  private val cleanups =
    new java.util.concurrent.CopyOnWriteArrayList[SparkSession => Unit]()

  private val watched =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def onSessionEnd(f: SparkSession => Unit): Unit = cleanups.add(f)

  /** Install the end-of-application eviction listener for `spark` (once
    * per session). Every cache keyed by SparkSession calls this on first
    * insert for the session. */
  def watch(spark: SparkSession): Unit =
    if (watched.add(spark)) {
      // a stopped context rejects listeners — nothing left to watch, and
      // the caller's cache op must not start throwing because of it
      try spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            sessionEnded(spark)
        })
      catch { case _: Throwable => }
    }

  /** Evict everything held for `spark` (the listener's entry point —
    * public so specs can drive it without stopping the shared context).
    * The session stays in `watched` while its context is alive: removing
    * it would make a later cache insert register a SECOND listener on
    * the same bus (they accumulate and each end-of-app would re-fire). */
  def sessionEnded(spark: SparkSession): Unit = {
    if (try spark.sparkContext.isStopped catch { case _: Throwable => true })
      watched.remove(spark) // context (and its listener) are gone
    clear(spark)
    cleanups.forEach { f =>
      try f(spark) catch { case _: Throwable => /* context is stopping */ }
    }
  }

  def getOrBuild(spark: SparkSession, kind: String, dir: String)(
      build: => DataFrame): DataFrame = {
    watch(spark)
    val key = (spark, kind, dir)
    val existing = tables.get(key)
    if (existing != null) existing
    else {
      // build OUTSIDE the map update: builders legitimately NEST
      // getOrBuild calls (minhashPairs materializes the signature table,
      // the vector gate materializes the normed corpus, ...), and
      // ConcurrentHashMap.computeIfAbsent forbids reentrant updates — it
      // throws "Recursive update" whenever the nested key happens to
      // land in the same hash bin, a lottery on the dir string. The cost
      // of the lock-free shape is a benign race: two threads may build
      // the same entry concurrently; the loser unpersists its copy and
      // adopts the winner's.
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      val prior = tables.putIfAbsent(key, df)
      if (prior != null) { df.unpersist(blocking = false); prior } else df
    }
  }

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
        if (df != null) {
          // unpersist on an already-stopping context can throw; the map
          // entry removal is the part that must not be skipped
          try df.unpersist(blocking = false) catch { case _: Throwable => }
        }
      }
    }
  }
}
