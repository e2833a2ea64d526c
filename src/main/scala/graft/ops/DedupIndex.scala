package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import TextHashing._

/** A session-scoped dedup index: the (doc_id, shingle) inverted index is
  * computed once and persisted, then every dedup query (exact jaccard,
  * MinHash-LSH, candidate verification) runs against the cached index
  * instead of re-shingling the corpus.
  *
  * This is the "persist the shingle table once per session" item from
  * docs/SCALING.md: at 100 TB, shingling is a full corpus scan + explode
  * — paying it once per session instead of once per query is the
  * difference between an interactive dedup workbench and a batch job.
  * Call close() when done (or let the context cleaner reap it).
  */
final class DedupIndex private (docs: DataFrame, level: StorageLevel) {

  /** The persisted inverted index, materialized EAGERLY with one clean
    * action: lazy materialization would happen inside the first dedup
    * query, where several subtrees of one plan race to compute the same
    * cached partitions concurrently — under a 32-thread local master the
    * unroll-memory contention can leave partitions unstored, making the
    * next run recompute an unpredictable fraction (observed as bimodal
    * 2 s / 9 s dedup_minhash timings). One count() = one scan, stored
    * once, deterministic from then on. */
  val shingles: DataFrame = {
    val sh = docShingles(docs).persist(level)
    sh.count()
    sh
  }

  def ngramPairs(threshold: Double = TextDedup.JaccardThreshold): DataFrame =
    jaccardFor(shingles, threshold, restrictTo = None)

  /** Exact verification of an externally-produced candidate list. */
  def verifyPairs(candidates: DataFrame,
                  threshold: Double = TextDedup.JaccardThreshold): DataFrame =
    jaccardFor(shingles, threshold, restrictTo = Some(candidates))

  def close(): Unit = shingles.unpersist(blocking = false)
}

object DedupIndex {
  def apply(docs: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DedupIndex =
    new DedupIndex(docs, level)
}
