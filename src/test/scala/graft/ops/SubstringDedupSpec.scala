package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Semantic checks for the repeated-substring dedup (Lee et al. recipe):
  * planted boilerplate must be removed at every occurrence except the
  * corpus-first one; island merging must not double-count overlaps; the
  * cleaned text must be exactly the surviving words. The DuckDB oracle
  * proves engine parity on real data; these pin the semantics. */
class SubstringDedupSpec extends SparkSpec {

  // 10-word boilerplate block planted in three docs at different offsets
  private val Boiler =
    "this license text is identical in every single source file"
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("subdup").toString
    Seq(
      // doc 0: boilerplate at the head — the corpus-first occurrence, kept
      (0L, s"$Boiler alpha beta gamma delta epsilon zeta", "en", "s", 1L),
      // doc 1: same block mid-doc — removed
      (1L, s"one two three $Boiler four five six", "en", "s", 1L),
      // doc 2: block at the tail, plus an 11-word overlap with doc 0's
      // head region (the block + 'alpha') — overlapping spans must merge
      (2L, s"seven eight $Boiler alpha", "en", "s", 1L),
      // doc 3: unrelated, shares nothing 10 words long
      (3L, "the quick brown fox jumps over the lazy dog repeatedly every single day", "en", "s", 1L),
      // doc 4: shorter than 10 words — contributes no spans
      (4L, "far too short to ever be boilerplate", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def docsDf = SubstringDedup.docs(spark, dir)

  test("repeated spans keep only the corpus-first occurrence") {
    val spans = SubstringDedup.removedSpans(docsDf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc 0 holds the first occurrence: nothing removed from it
    assert(!spans.exists(_._1 == 0L))
    // doc 1: the block sits at words 4..13
    assert(spans.filter(_._1 == 1L).toSeq === Seq((1L, 4, 13)))
    // doc 2: block at 3..12 PLUS the 11-word overlap with doc 0's head
    // ("...file alpha" = positions 3..13) merge into ONE island
    assert(spans.filter(_._1 == 2L).toSeq === Seq((2L, 3, 13)))
    assert(!spans.exists(_._1 == 3L) && !spans.exists(_._1 == 4L))
  }

  test("cleaned text is exactly the surviving words, pass-through for clean docs") {
    val clean = SubstringDedup.removeRepeatedSpans(docsDf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(0L) == s"$Boiler alpha beta gamma delta epsilon zeta")
    assert(clean(1L) == "one two three four five six")
    assert(clean(2L) == "seven eight")
    // untouched docs pass through word-normalized
    assert(clean(3L) == "the quick brown fox jumps over the lazy dog repeatedly every single day")
    assert(clean(4L) == "far too short to ever be boilerplate")
  }

  test("stats face counts merged islands once") {
    val stats = SubstringDedup.substringDedupStats(spark, dir).collect()
    val byDoc = stats.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byDoc.keySet === Set(1L, 2L))
    assert(byDoc(1L) === ((1L, 10L, 16L))) // one span, 10 of 16 words
    assert(byDoc(2L) === ((1L, 11L, 13L))) // merged island: 11 words, not 10+10
  }

  test("a doc that is pure boilerplate is fully emptied") {
    import spark.implicits._
    val d = Seq(
      (0L, s"prefix words here $Boiler suffix words"),
      (1L, Boiler)) // every word inside the repeated span
      .toDF("doc_id", "text")
    val clean = SubstringDedup.removeRepeatedSpans(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) == "")
  }
}
