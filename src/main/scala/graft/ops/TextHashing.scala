package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared text-hashing / shingling primitives for the dedup + fingerprint
  * operators. Everything here is built from engine-portable functions
  * (md5, substr, integer arithmetic) so the driver's DuckDB oracle can
  * compute bit-identical values — the correctness gate hash-compares.
  *
  * Performance note: the word array is always materialized into its own
  * projection (withColumn) before any expression references it more than
  * once — a lambda body that inlines split() re-evaluates it per array
  * element, turning shingling quadratic. CollapseProject keeps the
  * materialized column because split is non-cheap.
  */
object TextHashing {

  /** Large prime modulus for the minhash permutation family (fits well
    * inside Long even after the affine step: a < 2^7, h' < 2^31). */
  val P: Long = 2147483647L // 2^31 - 1

  /** Portable 60-bit string hash: first 15 hex chars of md5 as an integer.
    * Identical in DuckDB: cast(concat('0x', substr(md5(s),1,15)) as bigint).
    * Computed by the fused native expression (one digest, no hex-string
    * round-trip — plans/Md5Long64Expr); `md5LongComposite` is the
    * built-in-chain formulation it is property-tested against. */
  def md5Long(s: Column): Column = graft.plans.GraftExtensions.md5Long(s)

  def md5LongComposite(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Lower-cased whitespace words, empties dropped. */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** Word 3-gram shingles from an ALREADY-MATERIALIZED words column
    * (pass an attribute, not an expression — see class note). A document
    * shorter than 3 words contributes its whole text as one shingle. */
  def shinglesOf(ws: Column): Column =
    when(size(ws) < 3, array(concat_ws(" ", ws)))
      .otherwise(transform(
        sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))

  /** (doc_id, shingle) distinct pairs for a documents table.
    *
    * Distinctness is PER DOCUMENT (the pair carries doc_id), so it is
    * computed narrowly with `array_distinct` before the explode — a
    * per-row hash-set pass — instead of a global `.distinct()`, which
    * would shuffle every (doc_id, shingle) string pair in the corpus
    * (measured at sf100: the equivalent word-level distinct in
    * simhashSigs spilled ~50 GB for 5M docs before this change). Rows
    * are identical; the corpus-sized exchange simply never forms. */
  def docShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", words(col("text")))
      .select(col("doc_id"), explode(array_distinct(shinglesOf(col("ws")))).as("sh"))

  /** Exact pairwise Jaccard over shared shingles. Complete w.r.t. the
    * threshold (pairs sharing zero shingles have J=0) yet never all-pairs:
    * the self-join is on the shingle key, so cost is sum(df^2) per shingle,
    * not n^2 over documents — the standard inverted-index prefix of
    * set-similarity joins. At scale, add prefix filtering on rare shingles
    * to cut hot shingle groups.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame =
    jaccardFor(docShingles(docs), threshold, restrictTo = None)

  /** Jaccard over a prepared (doc_id, sh) table; when `restrictTo` is a
    * (doc_a, doc_b) candidate table, intersections are only computed for
    * those pairs (the LSH verify path — candidate count is tiny, so this
    * is two semi-joins instead of the full inverted-index join). */
  /** Exact Jaccard over shared shingles, optionally restricted to a
    * candidate pair set. Two verify strategies, chosen by the CALLER's
    * cost regime (measured at sf10, docs/SCALING.md):
    *
    *  - `verifyViaPairStream = true`: intersect the per-shingle pair
    *    stream (cost sum(df^2) — identical to the unfiltered join) with
    *    the candidates via a semi join of 16-byte pair keys. The right
    *    side when thresholds are LOW and prefixes long (ppjoin at
    *    t = 0.2 keeps ~80% of shingles): the candidate-expansion verify
    *    there shuffles sum_cands(|A|) rows each carrying a shingle
    *    string — measured 5B rows / >78 GB scratch at 500k docs, an
    *    out-of-disk, while the pair stream stays ~100x sf0.1.
    *  - `verifyViaPairStream = false`: expand each candidate by one
    *    side's shingles and hash-join the other side. The right side
    *    when HOT shingles make df^2 the bottleneck and candidates are
    *    few (the df-capped prefix filter) — expansion is then bounded
    *    by |cands| * |doc|, never df^2. */
  def jaccardFor(sh: DataFrame, threshold: Double,
                 restrictTo: Option[DataFrame],
                 verifyViaPairStream: Boolean = false): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.as("a")
    val b = sh.as("b")
    def pairStream =
      a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val joined = restrictTo match {
      case None => pairStream
      case Some(cand) if verifyViaPairStream =>
        pairStream.join(cand, Seq("doc_a", "doc_b"), "left_semi")
      case Some(cand) =>
        cand.join(a, col("a.doc_id") === col("doc_a"))
          .join(b, col("b.doc_id") === col("doc_b") && col("a.sh") === col("b.sh"))
          .select(col("doc_a"), col("doc_b"))
    }
    val inter = joined.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** LOSSLESS prefix-filtered Jaccard (PPJoin-grade, public-textbook:
    * Bayardo et al. "Scaling Up All Pairs", Xiao et al. PPJoin): exactly
    * the `jaccardPairs` output, but candidates are generated from a
    * PREFIX of each doc's shingles under a canonical global order
    * (ascending document frequency, shingle text tie-break — rare
    * shingles first, so hot shingles never enter the candidate join),
    * with two further exact-preserving pruning predicates applied inside
    * the candidate join itself:
    *
    *  - length filter: J(A,B) >= t forces min(|A|,|B|) >= t*max(|A|,|B|);
    *  - positional filter: both shingle lists are sorted by the same
    *    total order, so a shared shingle at positions (i, j) bounds the
    *    overlap by min(i-1, j-1) + 1 + min(|A|-i, |B|-j) — any pair
    *    whose bound can't reach t/(1+t)*(|A|+|B|) is pruned.
    *
    * Prefix length is |d| - ceil(t*|d|) + 1 (the classical Jaccard
    * prefix): every pair with J >= t provably shares a prefix shingle,
    * so — unlike `jaccardPairsPrefixFiltered`'s df cap — recall is 100%
    * by construction. Epsilon slack on the float comparisons only ever
    * ADMITS boundary pairs, never drops them. Verification is the same
    * candidate-restricted exact-Jaccard join, so values are exact too.
    * Cost: the candidate join touches sum over prefix shingles of df^2
    * instead of sum over ALL shingles — the hot (high-df) shingles sit
    * at the END of the canonical order and never reach a prefix at any
    * realistic threshold (docs/SCALING.md 10x row). */
  def jaccardPairsPPJoin(docs: DataFrame, threshold: Double): DataFrame =
    ppjoinFor(docShingles(docs), threshold)

  /** PPJoin over a prepared (doc_id, sh) table — pass a materialized/
    * session-cached shingle index (`TextDedup.index(..).shingles`) so
    * the scan+shingle+distinct subtree isn't recomputed for the window,
    * both candidate sides, and the verification. */
  def ppjoinFor(sh: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id")
    val pos = sh.join(dfreq, "sh")
      .withColumn("pos", row_number().over(byDoc.orderBy(col("df"), col("sh"))))
      .withColumn("n", count(lit(1)).over(byDoc))
    // The slack must scale with the magnitude of t*n: an absolute 1e-9
    // guards small products (0.2*15 = 3.0000...4) but ulp(t*n) passes
    // 1e-9 once t*n reaches the millions (multi-million-shingle docs),
    // where one upward FP rounding of an exactly-integral t*n would
    // over-ceil and cut the prefix short — a lost pair. The relative
    // 1e-12 term dominates double rounding error (~1.1e-16 relative) at
    // every magnitude; over-LONG prefixes only admit extra candidates,
    // which the exact verification below discards.
    def admitSlack(v: Column): Column = v * lit(1.0 - 1e-12) - lit(1e-9)
    val prefix = pos.filter(
      col("pos") <= col("n") - ceil(admitSlack(lit(threshold) * col("n"))) + 1)
    val minOverlapNum = lit(threshold) / (lit(1.0) + lit(threshold)) // * (|A|+|B|)
    val cands = prefix.as("pa")
      .join(prefix.as("pb"),
        col("pa.sh") === col("pb.sh") && col("pa.doc_id") < col("pb.doc_id")
          && least(col("pa.n"), col("pb.n")).cast("double") >=
            admitSlack(lit(threshold) * greatest(col("pa.n"), col("pb.n")).cast("double"))
          && (least(col("pa.pos"), col("pb.pos")) +
              least(col("pa.n") - col("pa.pos"), col("pb.n") - col("pb.pos"))).cast("double") >=
            admitSlack(minOverlapNum * (col("pa.n") + col("pb.n")).cast("double")))
      .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      .distinct()
    // low-threshold regime: prefixes are long, so verify via the
    // sum(df^2) pair stream, not candidate expansion (see jaccardFor)
    jaccardFor(sh, threshold, restrictTo = Some(cands), verifyViaPairStream = true)
  }

  /** Prefix-filtered Jaccard for web-scale corpora (docs/SCALING.md):
    * candidate pairs are generated ONLY from shingles with document
    * frequency <= maxShingleDf (the inverted-index cost is sum(df^2), so
    * capping df caps the join quadratically), then verified EXACTLY on
    * the full shingle sets — values are never approximated, only recall
    * is limited to pairs sharing at least one sub-cap shingle. */
  def jaccardPairsPrefixFiltered(docs: DataFrame, threshold: Double,
                                 maxShingleDf: Int): DataFrame = {
    val sh = docShingles(docs)
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf).select("sh")
    val rareSh = sh.join(rare, "sh")
    val cands = rareSh.as("ra")
      .join(rareSh.as("rb"),
        col("ra.sh") === col("rb.sh") && col("ra.doc_id") < col("rb.doc_id"))
      .select(col("ra.doc_id").as("doc_a"), col("rb.doc_id").as("doc_b"))
      .distinct()
    jaccardFor(sh, threshold, restrictTo = Some(cands))
  }

}
