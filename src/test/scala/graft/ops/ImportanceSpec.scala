package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Semantic checks for the data-selection scorers: hashed-ngram
  * importance weights must pull target-like raw docs ahead of unrelated
  * ones (the DSIR property), and unigram surprisal must rank rare-token
  * docs above common-token docs (the perplexity-filter property). */
class ImportanceSpec extends SparkSpec {

  // doc_id % 7 == 0 is the target slice: docs 0 and 7 define the target
  // distribution (finance vocabulary); raw docs 1-3 share it, 4-6 don't
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("impfix").toString
    Seq(
      (0L, "stocks rally as market gains lift bank shares higher today"),
      (7L, "bank stocks extend market rally with broad sector gains again"),
      (1L, "market rally continues as bank stocks post fresh gains"),
      (2L, "shares of the bank rose in a broad market rally"),
      (3L, "sector gains lift stocks as the rally extends further"),
      (4L, "the recipe calls for flour butter sugar and three eggs"),
      (5L, "migrating birds cross the valley before the first autumn frost"),
      (6L, "the violin section tuned quietly before the evening concert began"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("importance top-k prefers target-like raw docs") {
    val top = Importance.importanceTopK(spark, dir, k = 3).collect()
    // only raw docs are candidates
    assert(top.forall(_.getLong(0) % 7 != 0))
    // the three finance docs outrank recipe/birds/violin
    assert(top.map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // and the separation is real: worst selected beats best unselected
    // (absolute signs are meaningless under add-one smoothing — raw-only
    // features weigh strongly negative, so even good docs can sum < 0)
    val all = Importance.importanceTopK(spark, dir, k = 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(Seq(1L, 2L, 3L).map(all).min > Seq(4L, 5L, 6L).map(all).max)
  }

  test("importance output is rank-ordered with doc_id tie-break") {
    val rows = Importance.importanceTopK(spark, dir, k = 6).collect()
    val scores = rows.map(r => (r.getDouble(2), r.getLong(0)))
    val resorted = scores.sortBy { case (w, id) => (-w, id) }.toSeq
    assert(scores.toSeq === resorted)
  }

  test("unigram surprisal ranks rare-token docs above common-token docs") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("ppl").toString
    (Seq(
      (0L, "common common common common common common common common"),
      (1L, "common common common common rare common common common"),
      (2L, "zephyr quixotic baffling oblique vortex jumbled kryptic warble"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = TextAnalysis.unigramSurprisal(spark, d2).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(0L) < rows(1L) && rows(1L) < rows(2L))
    // n_words is the doc token count; nll_sum = nll_avg * n_words
    val full = TextAnalysis.unigramSurprisal(spark, d2).collect()
    full.foreach { r =>
      assert(math.abs(r.getDouble(2) / r.getLong(1) - r.getDouble(3)) < 1e-9)
    }
  }

  test("bigram surprisal sees word ORDER where the unigram filter cannot") {
    import spark.implicits._
    val d3 = Files.createTempDirectory("ppl2").toString
    // docs 0/1 repeat the same bigram continuation; doc 2 uses the SAME
    // unigrams in a novel order — identical unigram distribution per
    // token, different bigram structure
    (Seq(
      (0L, "alpha beta alpha beta alpha beta alpha beta"),
      (1L, "alpha beta alpha beta alpha beta alpha beta"),
      (2L, "alpha alpha beta beta alpha alpha beta beta"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d3/documents.parquet")
    val uni = TextAnalysis.unigramSurprisal(spark, d3).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val bi = TextAnalysis.bigramSurprisal(spark, d3).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // every doc has the same unigram mix: the unigram filter is blind
    assert(math.abs(uni(0L) - uni(2L)) < 1e-9, "unigram should not separate them")
    // the bigram filter separates the templated docs from the novel order
    assert(bi(0L) < bi(2L), s"repetitive continuation must score lower: $bi")
    assert(math.abs(bi(0L) - bi(1L)) < 1e-9, "identical docs score identically")
  }

  test("bigram surprisal: first token scores on the unigram alone") {
    import spark.implicits._
    val d4 = Files.createTempDirectory("ppl3").toString
    (Seq((0L, "solo"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d4/documents.parquet")
    val bi = TextAnalysis.bigramSurprisal(spark, d4).collect()
    val uni = TextAnalysis.unigramSurprisal(spark, d4).collect()
    assert(bi.length === 1 && bi(0).getLong(1) === 1L)
    assert(math.abs(bi(0).getDouble(2) - uni(0).getDouble(2)) < 1e-9)
  }
}
