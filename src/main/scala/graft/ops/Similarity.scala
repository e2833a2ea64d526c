package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (ArrayType(FloatType), 64-dim; /root/testdata/sf* /embeddings.parquet).
  *
  * Cosine similarity is computed with codegen'd higher-order functions
  * (zip_with + aggregate over doubles) — no Scala UDF, stays inside
  * whole-stage codegen.
  *
  * Scale posture: the brute-force path broadcasts the (small) query set and
  * scans the corpus once — top-k per query via window rank, which AQE keeps
  * as a partial sort per partition. The LSH path buckets the corpus by
  * sign-pattern so each query only scans its bucket: at 100 TB the bucket
  * join replaces the full scan (and more planes => finer buckets).
  */
object Similarity {

  val QueryIds = Seq(0, 1, 2)
  val TopK = 10

  /** Embeddings as doubles, with the L2 norm precomputed once per vector
    * — cosine over a pair then costs one fold (the dot), not three.
    * At 100 TB the norm column is written at ingest; the session analog is
    * computing it once per (session, dir) and persisting (SessionCache):
    * every similarity query in the session reads the same normed corpus.
    * If embeddings.parquet is rewritten mid-session, call
    * `SessionCache.invalidate(spark, "emb", dir)` first. */
  def emb(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "emb", dir) {
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))
        .withColumn("nrm", sqrt(GraftExtensions.dot(col("v"), col("v"))))
    }

  /** dot(a,b) as a sequential left fold — same association order as the
    * oracle so values match bit-for-bit where possible. (HOF formulation,
    * kept for spec cross-checks; hot paths use the fused graft_dot.) */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from materialized norms: ONE fused fold (the dot) per candidate
    * pair instead of graft_cosine's three — the reason `emb` carries `nrm`.
    * Bit-identical to graft_cosine: same sequential dot, same sqrt-per-side
    * then multiply. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    GraftExtensions.dot(a, b) / (na * nb)

  /** Brute-force exact top-k: broadcast the query vectors, one scan of the
    * corpus, rank per query. Ranking is on the ROUNDED similarity with
    * vec_id tie-break so cross-engine last-bit drift can't reorder. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id").isin(QueryIds: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    import org.apache.spark.sql.expressions.Window
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos_sim",
        round(cosineWithNorms(col("qv"), col("v"), col("qnrm"), col("nrm")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id", "cos_sim")
      .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
  }

  /** Sign-pattern LSH bucket over the first `nBits` dimensions — an
    * axis-aligned random-hyperplane sketch (the dims of a trained embedding
    * are effectively random directions). Deterministic and oracle-portable.
    */
  def bucket(v: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(v, i + 1) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN top-k: candidates share the query's sign bucket, so
    * the per-query scan is corpus_size / 2^nBits in expectation. Equality
    * join on the bucket key — shuffle-partitionable, no cross join. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val nBits = 4
    val e = emb(spark, dir).withColumn("bkt", bucket(col("v"), nBits))
    val q = e.filter(col("vec_id").isin(QueryIds: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"), col("bkt").as("qbkt"))
    import org.apache.spark.sql.expressions.Window
    val scored = e.join(broadcast(q), col("bkt") === col("qbkt") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim",
        round(cosineWithNorms(col("qv"), col("v"), col("qnrm"), col("nrm")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "vec_id", "cos_sim")
      .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
  }

  /** Multi-probe sign-LSH top-k: each query also probes the 4 buckets at
    * Hamming distance 1 from its own (flip one sign bit per probe) —
    * the standard recall lever that keeps the same equality-join shape:
    * candidates ~= 5/16 of the corpus here instead of 1/16, still never
    * a scan. The probe list is a tiny generator on the broadcast side. */
  def lshMultiProbeTopK(spark: SparkSession, dir: String): DataFrame = {
    val nBits = 4
    val e = emb(spark, dir).withColumn("bkt", bucket(col("v"), nBits))
    val probes = (0 until nBits).map(i => col("qbkt0").bitwiseXOR(lit(1L << i)))
    val q = e.filter(col("vec_id").isin(QueryIds: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        col("bkt").as("qbkt0"))
      .withColumn("probe_bkt", explode(array(col("qbkt0") +: probes: _*)))
    import org.apache.spark.sql.expressions.Window
    val scored = e.join(broadcast(q), col("bkt") === col("probe_bkt") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim",
        round(cosineWithNorms(col("qv"), col("v"), col("qnrm"), col("nrm")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "vec_id", "cos_sim")
      .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
  }

  /** Embedding-cosine near-duplicate pairs: bucket by sign pattern, pair
    * within bucket, keep cosine >= threshold. (A near-dup pair almost
    * surely agrees on coarse sign buckets; this is SimHash-for-vectors.)
    * The default threshold is the fixture-tuned oracle value (the
    * fixture's max pairwise cosine is ~0.51); real corpora pass their
    * own — 0.9+ for true near-dup gating. The candidate stage's recall
    * vs brute-force pairs is measured in docs/SCALING.md (AnnRecall). */
  def embeddingNearDup(spark: SparkSession, dir: String,
                       threshold: Double = 0.35): DataFrame = {
    val nBits = 4
    val e = emb(spark, dir).withColumn("bkt", bucket(col("v"), nBits))
    e.as("a").join(e.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_sim",
        round(cosineWithNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** The IVF coarse quantizer: one row per cluster, (c_label, cv) with
    * the centroid as a mean vector. Centroid components via EXACT decimal
    * sums (order-independent), divided once in double — plain double avg
    * depends on partial-agg summation order and can flip the
    * nearest-centroid tie vs the oracle. */
  private def centroidsOf(e: DataFrame): DataFrame = {
    val avgCols = (0 until 64).map(i =>
      (sum(element_at(col("v"), i + 1).cast("decimal(27,12)")).cast("double") /
        count(lit(1))).as(s"a$i"))
    e.groupBy("label")
      .agg(avgCols.head, avgCols.tail: _*)
      .select(col("label").as("c_label"),
        array((0 until 64).map(i => col(s"a$i")): _*).as("cv"))
  }

  /** Default on-disk location of the persisted IVF quantizer for an
    * embeddings dir (co-located with the data it indexes). */
  def ivfIndexPath(dir: String): String = s"$dir/ivf_index.parquet"

  /** Build the IVF quantizer ONCE and persist it as parquet, so a cold
    * session probes without re-deriving centroids from the corpus — the
    * difference between an index and a per-session cache at 100 TB.
    * Returns the written path; every session's next `ivfTopK` against
    * `dir` picks it up (the in-session cache entry is invalidated here,
    * like TextDedup.invalidate after a corpus rewrite). Rebuild after
    * rewriting embeddings.parquet. */
  def buildIvfIndex(spark: SparkSession, dir: String, at: Option[String] = None): String = {
    val path = at.getOrElse(ivfIndexPath(dir))
    centroidsOf(emb(spark, dir)).write.mode("overwrite").parquet(path)
    graft.core.SessionCache.invalidate(spark, "ivf_centroids", dir)
    path
  }

  private def ivfIndexExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(ivfIndexPath(dir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** IVF (inverted-file) ANN, nprobe=1: the label clusters act as the
    * coarse quantizer — centroids are per-cluster mean vectors; a query
    * probes its nearest centroid (10 rows, broadcast) and scans only that
    * cluster's members. At 100 TB the cluster assignment is the partition
    * key, so a probe reads ~1/n_clusters of the corpus.
    *
    * The quantizer resolves in order: the PERSISTED index next to the
    * embeddings when present (`buildIvfIndex` — no training work at all,
    * any session, any JVM), else computed once per (session, dir) and
    * session-cached. Values are identical either way (lossless parquet
    * round-trip of the exact-decimal centroids), so the oracle hash
    * doesn't depend on which path served the query. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val centroids = graft.core.SessionCache.getOrBuild(spark, "ivf_centroids", dir) {
      if (ivfIndexExists(spark, dir)) spark.read.parquet(ivfIndexPath(dir))
      else centroidsOf(e)
    }
    val q = e.filter(col("vec_id").isin(QueryIds: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    import org.apache.spark.sql.expressions.Window
    val probe = Window.partitionBy("qid")
      .orderBy(col("c_sim").desc, col("c_label").asc)
    // centroids are derived vectors with no stored norm — and there are only
    // n_clusters of them on the broadcast side, so graft_cosine is fine here
    val best = q.crossJoin(broadcast(centroids))
      .withColumn("c_sim", round(GraftExtensions.cosine(col("qv"), col("cv")), 6))
      .withColumn("crn", row_number().over(probe))
      .filter(col("crn") === 1)
      .select(col("qid"), col("qv"), col("qnrm"), col("c_label"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id").asc)
    e.join(broadcast(best), col("label") === col("c_label") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim",
        round(cosineWithNorms(col("qv"), col("v"), col("qnrm"), col("nrm")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "vec_id", "cos_sim")
      .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
  }

  /** Incremental EMBEDDING near-dup — the vector-modality counterpart of
    * `CurationPipeline.incrementalNearDedup`: drop incoming vectors whose
    * cosine vs any INDEXED vector clears `threshold`, plus near-dups of a
    * smaller-id vector inside the batch. The index is fixed-width per
    * vector — (vec_id, bkt, v, nrm): the stored vector+norm IS the
    * verification payload, so history is never re-embedded or re-scanned;
    * candidates come from sign-bucket EQUALITY joins (the incoming side
    * also probes the `nBits` Hamming-1 buckets — the multi-probe recall
    * lever — since a near-dup can straddle one sign flip). Same-vec_id
    * index hits are ignored, so a crash-replayed batch whose own rows are
    * already indexed reproduces its survivors.
    *
    * `newVecs`: (vec_id, embedding) raw frame. Returns (survivors in the
    * input shape, their index rows) — the caller appends the rows
    * (append-only, like the text indexes). */
  /** The fixed-width index row for a raw (vec_id, embedding) frame:
    * (vec_id, bkt, v, nrm) — what `incrementalNearDup` persists and
    * verifies against. */
  def vectorIndexRows(vecs: DataFrame, nBits: Int = 4): DataFrame =
    vecs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(GraftExtensions.dot(col("v"), col("v"))))
      .withColumn("bkt", bucket(col("v"), nBits))
      .select("vec_id", "bkt", "v", "nrm")

  def incrementalNearDup(
      newVecs: DataFrame, index: DataFrame,
      threshold: Double, nBits: Int = 4): (DataFrame, DataFrame) = {
    val prepared = vectorIndexRows(newVecs, nBits)
    val probes = (0 until nBits).map(i => col("bkt").bitwiseXOR(lit(1L << i)))
    val probed = prepared
      .withColumn("probe_bkt", explode(array(col("bkt") +: probes: _*)))
    // nrm > 0 guards: a zero (failed/padded) embedding makes the cosine
    // 0/0 = NaN, and Spark SQL orders NaN ABOVE every number — an
    // unguarded `NaN >= threshold` is TRUE, so one indexed zero vector
    // would silently swallow every later vector in its bucket
    val dropOld = probed
      .join(index.select(col("vec_id").as("idx_id"), col("bkt").as("probe_bkt"),
        col("v").as("iv"), col("nrm").as("inrm")), Seq("probe_bkt"))
      .filter(col("vec_id") =!= col("idx_id")
        && col("nrm") > 0 && col("inrm") > 0
        && cosineWithNorms(col("v"), col("iv"), col("nrm"), col("inrm")) >= threshold)
      .select("vec_id")
    val dropNew = probed.as("x")
      .join(prepared.as("y"),
        col("x.probe_bkt") === col("y.bkt") && col("x.vec_id") > col("y.vec_id"))
      .filter(col("x.nrm") > 0 && col("y.nrm") > 0
        && cosineWithNorms(col("x.v"), col("y.v"), col("x.nrm"), col("y.nrm")) >= threshold)
      .select(col("x.vec_id").as("vec_id"))
    val dropped = dropOld.unionByName(dropNew).distinct()
    val survivors = newVecs.join(dropped, Seq("vec_id"), "left_anti")
    val rows = prepared.join(survivors.select("vec_id"), Seq("vec_id"), "left_semi")
      .select("vec_id", "bkt", "v", "nrm")
    (survivors, rows)
  }

  /** Centroid per label — the reduction side of an IVF index build: one
    * pass, partial aggregation per partition (sums of 64-dim arrays). */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val dim = 64
    val sums = (0 until dim).map(i =>
      round(sum(element_at(col("v"), i + 1).cast("decimal(27,12)")).cast("double"), 3).as(f"s$i%02d"))
    e.groupBy("label")
      .agg(count(lit(1)).as("n"), sums: _*)
      .orderBy("label")
  }
}
