package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextHashing.words

/** Repeated-substring deduplication — the word-level Spark rendering of
  * the suffix-array recipe from "Deduplicating Training Data Makes
  * Language Models Better" (Lee et al., 2022): any word span of length
  * `n` that occurs at more than one (doc, position) in the corpus keeps
  * only its FIRST occurrence (smallest (doc_id, position)); every other
  * occurrence is removed from its document.
  *
  * This is the substring-level complement of the document-level dedup
  * family in TextDedup: near-dup documents share most of their text, but
  * boilerplate (headers, license blocks, templated paragraphs) repeats
  * across otherwise-unrelated documents and survives document-level
  * dedup entirely — the published result is that removing it measurably
  * improves LM training.
  *
  * Plan shape (the 100 TB posture): positional word n-grams keyed by
  * md5 — the shuffle carries (doc_id, pos, 32-char hex key), never the
  * n-word span text; duplicate detection is a per-key window whose
  * group is the occurrence list of ONE span (bounded by that span's
  * corpus frequency, not the corpus); interval merging is a per-doc
  * window (bounded by document length). One corpus-token-proportional
  * shuffle plus two bounded windows — no pair join, nothing
  * corpus-sized per partition or on the driver. The suffix array of
  * the original single-node recipe is exactly the data structure this
  * shuffle-and-window decomposition distributes away.
  *
  * Conventions (pinned by the DuckDB oracle):
  *  - word positions are 1-based inclusive; a span of length n starting
  *    at pos covers [pos, pos + n - 1];
  *  - documents shorter than n words contribute no spans (unlike the
  *    shingle short-doc convention — a 3-word doc is not "boilerplate");
  *  - overlapping AND adjacent removed spans merge into one maximal
  *    island, so words_removed never double-counts;
  *  - md5 keys stand in for span equality (128 bits; the standard
  *    "exact modulo digest collision" trade every content-hash dedup
  *    in this repo makes, see TextAnalysis.fingerprints).
  */
object SubstringDedup {

  /** Default span length in words. The published recipe uses 50 BPE
    * tokens; 10 words is the same order of magnitude for this corpus's
    * ~55-word documents while still far above chance n-gram collision. */
  val SpanWords = 10

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Maximal removed-span table: (doc_id, s, e) 1-based inclusive word
    * intervals, every island the union of length-n spans whose text
    * occurs earlier (by (doc_id, pos)) somewhere in the corpus. */
  def removedSpans(d: DataFrame, n: Int = SpanWords): DataFrame = {
    require(n >= 2, s"span length n=$n must be >= 2")
    // ws is materialized before the transform references it per element
    // (TextHashing class note: inlining split() turns this quadratic)
    val grams = d
      .withColumn("ws", words(col("text")))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ws")) - (n - 1)),
        i => struct(i.as("pos"), md5(concat_ws(" ",
          (0 until n).map(j => element_at(col("ws"), i + j)): _*)).as("gk")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gk").as("gk"))
    // every occurrence of a span except its corpus-first one is removed;
    // (doc_id, pos) is unique within a gram key, so row_number is total
    val occ = Window.partitionBy("gk").orderBy("doc_id", "pos")
    val dup = grams
      .withColumn("rn", row_number().over(occ))
      .filter(col("rn") > 1)
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + (n - 1)).as("e"))
    // gaps-and-islands merge: a span starts a new island iff it begins
    // past the running max end + 1 (adjacency merges too, see scaladoc)
    val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
    dup
      .withColumn("brk", when(col("s") >
        coalesce(max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1)) + 1, 1).otherwise(0))
      .withColumn("isle",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("isle"))
      .agg(min("s").as("s"), max("e").as("e"))
      .select(col("doc_id"), col("s"), col("e"))
  }

  /** Cleaned corpus: text rebuilt without the removed spans. Output text
    * is word-normalized (lower-cased, single-spaced) because the operator
    * works in word space — same convention as the chunking output. Docs
    * with nothing removed pass through (normalized) unchanged. */
  def removeRepeatedSpans(d: DataFrame, n: Int = SpanWords): DataFrame = {
    val spans = removedSpans(d, n)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    d.withColumn("ws", words(col("text")))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), concat_ws(" ",
        transform(keptPositions(col("ws"), col("spans")),
          p => element_at(col("ws"), p))).as("clean_text"))
  }

  /** 1-based positions of `ws` outside every (s, e) span; spans may be
    * null (doc lost nothing). Membership test is order-insensitive, so
    * collect_list's nondeterministic span order is harmless. */
  private def keptPositions(ws: Column, spans: Column): Column =
    filter(sequence(lit(1), size(ws)), p =>
      !exists(coalesce(spans, array().cast("array<struct<s:int,e:int>>")),
        sp => p >= sp.getField("s") && p <= sp.getField("e")))

  /** Query face: per-doc removal stats + md5 of the cleaned text, for
    * docs that lost at least one span. The clean_md5 column makes the
    * oracle hash sensitive to WHICH words were removed, not just how
    * many, without emitting corpus-sized text. */
  def substringDedupStats(spark: SparkSession, dir: String,
                          n: Int = SpanWords): DataFrame = {
    val d = docs(spark, dir)
    val byDoc = removedSpans(d, n)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("words_removed"),
        collect_list(struct(col("s"), col("e"))).as("spans"))
    d.withColumn("ws", words(col("text")))
      .join(byDoc, "doc_id")
      .select(col("doc_id"), col("n_spans"), col("words_removed"),
        size(col("ws")).cast("long").as("n_words"),
        md5(concat_ws(" ", transform(keptPositions(col("ws"), col("spans")),
          p => element_at(col("ws"), p)))).as("clean_md5"))
      .orderBy("doc_id")
  }
}
