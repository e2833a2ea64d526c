package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import TextHashing.{md5Long, words}

/** Dataset-mixing operators for training-data assembly: temperature-
  * weighted domain resampling, per-domain quota caps, weighted priority
  * sampling, and token-budget shard packing. The samplers draw their
  * "randomness" from the 60-bit md5 content hash, so every operator is a
  * pure function of the corpus — rerunning a mix on the same data yields
  * the same dataset on any engine that can compute md5 (the DuckDB
  * oracles recompute each draw bit for bit).
  *
  * Scale shape: every operator is one scan plus one aggregation-grade
  * shuffle. Domain statistics (20-ish rows) ride broadcast joins; nothing
  * collects row data to the driver except `packShards`' per-partition
  * token totals (one row per partition — the classic two-phase
  * distributed prefix sum).
  */
object Mixing {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** 2^60 as a double (exact: power of two). */
  private val TwoPow60 = 1152921504606846976.0

  /** u(x) ∈ [0, 1): the 60-bit md5 hash scaled to the unit interval —
    * the deterministic uniform every sampler here draws from. One double
    * division of exactly-representable integers, so engines agree on
    * every bit. */
  def unitHash(c: Column): Column = md5Long(c) / lit(TwoPow60)

  /** Temperature-weighted domain resampling — the multilingual-corpus
    * mixing rule (sampling shares ∝ n_d^alpha; alpha < 1 flattens the
    * head, alpha = 1 is proportional): the expected output size is
    * `frac` of the corpus, allocated over domains by the tempered
    * shares, materialized as one deterministic Bernoulli filter
    * u(text) < p_d.
    *
    * p_d = min(1, frac · N · share_d / n_d) with
    * share_d = n_d^alpha / Σ_e n_e^alpha, rounded to 6 decimals so the
    * acceptance threshold is engine-portable (pow is not correctly
    * rounded; the hash draw itself is exact). Domains whose tempered
    * allocation exceeds their size keep every doc — the usual epoch-
    * repeat for tiny domains happens downstream, not by oversampling
    * here.
    *
    * Plan: domain counts (one agg, |domains| rows) broadcast back onto
    * the scan; the filter is a codegen'd expression on (text, domain).
    * Returns the kept docs with their domain rate attached. */
  def temperatureMix(spark: SparkSession, dir: String, domainCol: String,
                     alpha: Double, frac: Double): DataFrame =
    temperatureMixDf(docs(spark, dir), domainCol, alpha, frac)

  /** Frame-shaped core of `temperatureMix` (needs `text` + the domain
    * column; extra columns pass through). */
  def temperatureMixDf(d: DataFrame, domainCol: String,
                       alpha: Double, frac: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha outside (0, 1]")
    require(frac > 0.0 && frac <= 1.0, s"frac=$frac outside (0, 1]")
    val counts = d.groupBy(col(domainCol).as("_dom"))
      .agg(count(lit(1)).cast("double").as("n_d"))
    // scalar aggregates over a |domains|-row frame: a tiny two-row
    // cross-joined broadcast, never a driver collect
    val totals = counts.agg(
      sum("n_d").as("n_total"),
      sum(pow(col("n_d"), lit(alpha))).as("z"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("_dom"),
        round(least(lit(1.0),
          lit(frac) * col("n_total") * pow(col("n_d"), lit(alpha)) / col("z") / col("n_d")),
          6).as("rate"))
    d.join(broadcast(rates), col(domainCol) === col("_dom"))
      .filter(unitHash(col("text")) < col("rate"))
      .drop("_dom")
  }

  /** The UPSAMPLING half of temperature mixing: `temperatureMixDf` caps
    * every domain's rate at 1 (downsample-only) and leaves the epoch
    * repeat of tiny domains "downstream" — this is that downstream.
    * Rates are the same tempered shares WITHOUT the cap
    * (p_d = frac · N · share_d / n_d, share_d ∝ n_d^alpha, rounded to
    * 6 decimals); a doc emits floor(p_d) whole copies plus one more when
    * u(text) < frac(p_d) — deterministic Bernoulli on the SAME content-
    * hash uniform, so expected output is exactly frac · N distributed
    * ∝ n_d^alpha across domains, upsampled domains included. Output
    * rows carry `epoch` (0-based copy index): downstream shuffling/
    * packing can interleave epochs by hashing (doc_id, epoch).
    *
    * Plan: identical to temperatureMix (domain-count agg broadcast back
    * onto the scan) + a bounded per-row sequence explode — copies per
    * doc is p_d rounded up, so output size is the mix's by design. */
  def epochRepeatMixDf(d: DataFrame, domainCol: String,
                       alpha: Double, frac: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha outside (0, 1]")
    require(frac > 0.0, s"frac=$frac must be positive")
    val counts = d.groupBy(col(domainCol).as("_dom"))
      .agg(count(lit(1)).cast("double").as("n_d"))
    val totals = counts.agg(
      sum("n_d").as("n_total"),
      sum(pow(col("n_d"), lit(alpha))).as("z"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("_dom"),
        round(lit(frac) * col("n_total") * pow(col("n_d"), lit(alpha)) / col("z") / col("n_d"),
          6).as("rate"))
    d.join(broadcast(rates), col(domainCol) === col("_dom"))
      .withColumn("n_copies",
        (floor(col("rate")) +
          when(unitHash(col("text")) < col("rate") - floor(col("rate")), 1L)
            .otherwise(0L)).cast("long"))
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("_dom", "n_copies")
  }

  def epochRepeatMix(spark: SparkSession, dir: String, domainCol: String,
                     alpha: Double, frac: Double): DataFrame =
    epochRepeatMixDf(docs(spark, dir), domainCol, alpha, frac)

  /** Per-domain quota cap: keep at most `cap` docs per domain, chosen by
    * the content-hash priority (a deterministic uniform draw, so the
    * survivors are an unbiased sample of each domain, not its head).
    * One window shuffle on the domain key; the rank never leaves the
    * exact integer/hash domain, so there is no float tie risk —
    * (u, doc_id) is a total order. */
  def quotaSample(spark: SparkSession, dir: String, domainCol: String,
                  cap: Int): DataFrame =
    quotaSampleDf(docs(spark, dir), domainCol, cap)

  /** Frame-shaped core of `quotaSample` (needs `doc_id`, `text` + the
    * domain column).
    *
    * Two-phase ranking, because a plain per-domain window caps
    * parallelism at the DOMAIN count (a 10x smoke showed the biggest
    * domain's one reducer dominating the wall clock): phase 1 ranks
    * within (domain, salt) shards — `salts`x the parallelism — and keeps
    * each shard's top `cap`, which provably contains the domain's global
    * top `cap` (any doc in the domain top-cap is in its own shard's
    * top-cap a fortiori). Phase 2 re-ranks the survivors, at most
    * salts*cap rows per domain regardless of corpus size. Both phases
    * order by the same (hash, id) total order, so the result is
    * IDENTICAL to the single-window form — only the shuffle shape
    * changes. */
  def quotaSampleDf(d: DataFrame, domainCol: String, cap: Int,
                    salts: Int = 32): DataFrame = {
    require(cap > 0, s"cap=$cap must be positive")
    require(salts > 0, s"salts=$salts must be positive")
    val u = md5Long(col("text"))
    val pre = Window.partitionBy(col(domainCol), pmod(u, lit(salts.toLong)))
      .orderBy(u.asc, col("doc_id").asc)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(u.asc, col("doc_id").asc)
    d.withColumn("rn", row_number().over(pre))
      .filter(col("rn") <= cap)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .drop("rn")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * exponential-rank): the k docs with the largest u^(1/w) keys, w > 0
    * taken from `weightCol`. Keys are rounded to 6 decimals with a
    * doc_id tie-break so the selection is engine-portable.
    *
    * Two physical shapes, identical output:
    *  - small k: global top-k (TakeOrderedAndProject — a k-row heap per
    *    partition, then k rows on the driver);
    *  - k >= `ThresholdCutover`: the training-sampler shape (natural k
    *    is millions, where per-partition k-row heaps and a k-row driver
    *    merge stop being "small") — find the k-th key by counting and
    *    FILTER, one corpus scan, nothing k-sized on the driver
    *    (`weightedSampleByThreshold`). */
  def weightedSample(spark: SparkSession, dir: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val base = docs(spark, dir)
      .filter(col(weightCol) > 0)
      .withColumn("w_key", weightKey(weightCol))
    if (k >= ThresholdCutover) weightedSampleByThreshold(base, k)
    else base.orderBy(col("w_key").desc, col("doc_id").asc).limit(k)
  }

  /** The Efraimidis–Spirakis priority key u(text)^(1/w), rounded to 6
    * decimals (engine-portable, and the rounding is what bounds the
    * distinct-key count the threshold path leans on). */
  private def weightKey(weightCol: String): Column =
    round(pow(unitHash(col("text")), lit(1.0) / col(weightCol)), 6)

  /** k at which `weightedSample` switches to the threshold plan. */
  val ThresholdCutover = 65536

  /** Threshold-selection top-k over a frame carrying `w_key` + `doc_id`:
    * exactly the rows `orderBy(w_key desc, doc_id asc).limit(k)` would
    * keep, without ever holding k rows in one place.
    *
    *  1. per-key counts — the 6-decimal rounding bounds this aggregate
    *     at 10^6+1 rows regardless of corpus size, so the running-total
    *     window over it is bounded work, not corpus work;
    *  2. the k-th key t = the largest key whose descending running
    *     count reaches k (one 2-column row to the driver — the plan
    *     constant for the filter, packShards-style);
    *  3. the tie cutoff — the (k - above)-th doc_id among ONLY the
    *     threshold-key rows (normally a handful; degenerates toward a
    *     corpus sort only if every weight rounds to one key) — fetched
    *     as a second one-row driver constant;
    *  4. selection is then ONE predicate: w_key > t OR (w_key = t AND
    *     doc_id <= cutoff).
    *
    * Cost shape: three jobs total — the per-key count (column-pruned to
    * the key's inputs), the tie-cutoff probe (same narrow columns), and
    * the final full-width scan when the result is consumed. Nothing
    * k-sized ever sits per partition or on the driver; the two extra
    * jobs read only the weight/id columns, not the corpus rows. */
  def weightedSampleByThreshold(base: DataFrame, k: Int): DataFrame = {
    val counts = base.select("w_key").groupBy("w_key").agg(count(lit(1)).as("c"))
    // bounded single-partition window (<= 10^6+1 rows, see step 1)
    val cumW = Window.orderBy(col("w_key").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = counts
      .withColumn("cum", sum("c").over(cumW))
      .filter(col("cum") >= k)
      .orderBy(col("w_key").desc)
      .limit(1)
      .select(col("w_key"), (col("cum") - col("c")).as("above"))
      .collect()
    if (thr.isEmpty) return base // corpus smaller than k: keep everything
    val t = thr(0).getDouble(0)
    val above = thr(0).getLong(1)
    val rem = k - above // > 0: cum first reached k AT this key
    // the rem-th tie doc_id, from the narrow projection only
    val cutoff = base.select("w_key", "doc_id")
      .filter(col("w_key") === t)
      .orderBy(col("doc_id").asc)
      .limit(rem.toInt)
      .agg(max("doc_id"))
      .collect()(0).getLong(0)
    base.filter(col("w_key") > t ||
      (col("w_key") === t && col("doc_id") <= cutoff))
  }

  /** Token-budget shard packing: documents in doc_id order are cut into
    * shards of ~`budget` tokens (shard = exclusive-prefix-sum div
    * budget — docs are never split, so a shard's total stays under
    * budget + the one doc that crosses the line). This is the
    * "pack the corpus into fixed-size training shards" step, and its
    * engine is a textbook two-phase distributed prefix sum:
    *
    *  1. range-partition + sort by doc_id (the shuffle the final sharded
    *     write wants anyway);
    *  2. per-partition token totals to the driver — one row PER
    *     PARTITION, never per doc;
    *  3. a map over each partition adds its exclusive offset to the
    *     running sum. Both passes act on the SAME RDD lineage, so the
    *     scan + range shuffle's map stage execute once — the scheduler
    *     reuses a computed shuffle stage across jobs on one lineage —
    *     and only the cheap post-shuffle result stage runs twice. (The
    *     earlier formulation planned pass 1 as a separate DataFrame
    *     aggregation, which re-ran the scan and shuffle.)
    *
    * All arithmetic is exact longs — no float drift anywhere — which is
    * why the assignment hash-matches a single-node window computation
    * (the DuckDB oracle) at any partition count. */
  def packShards(df: DataFrame, idCol: String, tokenCol: String, budget: Long,
                 numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val ordered = df
      .select(col(idCol).cast("long").as("id"), col(tokenCol).cast("long").as("tokens"))
      .repartitionByRange(p, col("id"))
      .sortWithinPartitions("id")
    // ONE materialized plan for both passes (see scaladoc): toRdd is
    // memoized per QueryExecution, so pass 1 and pass 2 share the
    // shuffle dependency instead of re-planning it
    val rdd = ordered.queryExecution.toRdd
    // pass 1: per-partition totals (partition-count rows, driver-bounded;
    // summation is order-free so the partition sort is irrelevant here)
    val partSums = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var t = 0L
      it.foreach(t += _.getLong(1))
      Iterator.single(pid -> t)
    }.collect().toMap
    val offsets = (0 until p).scanLeft(0L)((acc, pid) => acc + partSums.getOrElse(pid, 0L))
    val bOffsets = spark.sparkContext.broadcast(offsets.toArray)
    // pass 2: per-partition running sum + broadcast offset (genuine
    // per-partition imperative logic, the one place mapPartitions earns
    // its keep)
    val rows = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var cum = bOffsets.value(pid)
      it.map { ir =>
        val id = ir.getLong(0)
        val t = ir.getLong(1)
        val shard = cum / budget
        cum += t
        Row(id, t, shard)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tokens", LongType, nullable = false),
      StructField("shard", LongType, nullable = false))))
  }

  // --- query faces (SparkEntry wiring) ----------------------------------

  /** Per-domain audit of the temperature mix: corpus size, sampled size,
    * and the rate that produced it — the "mixing table" of a dataset
    * card. */
  def temperatureMixStats(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(spark, dir, "source", alpha = 0.5, frac = 0.3)
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"), min("rate").as("rate"))
      .orderBy("source")

  /** Epoch-repeat audit: per domain, input size, emitted copy count
    * (epochs included) and a copy-weighted id checksum — pins which
    * docs repeat and how often, not just totals. */
  def epochRepeatStats(spark: SparkSession, dir: String): DataFrame =
    epochRepeatMix(spark, dir, "source", alpha = 0.5, frac = 0.3)
      .groupBy("source")
      .agg(count(lit(1)).as("n_emitted"),
        countDistinct("doc_id").as("n_docs"),
        sum("doc_id").as("id_sum"),
        min("rate").as("rate"))
      .orderBy("source")

  /** Quota audit: per-lang kept count plus an id checksum, so the oracle
    * pins WHICH docs survived, not just how many. */
  def quotaSampleStats(spark: SparkSession, dir: String): DataFrame =
    quotaSample(spark, dir, "lang", cap = 30)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
      .orderBy("lang")

  /** The length-weighted sample itself (w = n_chars: longer docs drawn
    * proportionally more often). */
  def weightedSampleTopK(spark: SparkSession, dir: String): DataFrame =
    weightedSample(spark, dir, "n_chars", k = 50)
      .select("doc_id", "w_key")
      .orderBy(col("w_key").desc, col("doc_id").asc)

  /** The THRESHOLD plan under the oracle at small k: same selection as
    * `weightedSampleTopK` (the two shapes are provably identical), run
    * through `weightedSampleByThreshold` so the scale path is
    * hash-pinned end-to-end, not just spec-asserted. */
  def weightedSampleThresholdFace(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .filter(col("n_chars") > 0)
      .withColumn("w_key", weightKey("n_chars"))
    weightedSampleByThreshold(base, k = 50)
      .select("doc_id", "w_key")
      .orderBy(col("w_key").desc, col("doc_id").asc)
  }

  /** Shard manifest for packing the documents table at 2000 whitespace
    * tokens per shard: shard → docs, token total, id span. */
  def packShardsManifest(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir)
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("n_tok"))
    shardManifest(packShards(tok, "doc_id", "n_tok", budget = 2000L))
  }

  /** `pack_shards_bpe` query face: the same token-budget packing with
    * budgets counted in TRAINED BPE tokens (TextAnalysis.bpeTokenCounts)
    * instead of whitespace words — shard sizes then match what a
    * training job tokenizing with that merge table actually consumes.
    * packShards is token-column-generic; this face just feeds it the
    * tokenizer-aware column. */
  def packShardsBpeManifest(spark: SparkSession, dir: String): DataFrame =
    shardManifest(packShards(
      graft.ops.TextAnalysis.bpeTokenCounts(spark, dir),
      "doc_id", "n_tokens", budget = 2000L))

  private def shardManifest(packed: DataFrame): DataFrame =
    packed
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("sum_tokens"),
        min("id").as("min_id"), max("id").as("max_id"))
      .orderBy("shard")

  /** Deterministic seeded GLOBAL SHUFFLE into training shards — the
    * "randomize example order before writing shards" step every
    * training pipeline runs after curation. Each doc draws a 60-bit key
    * from md5(seed ':' doc_id); its shard is key mod `nShards` and its
    * position within the shard is key order. Changing the seed is a
    * fresh permutation; rerunning is byte-identical.
    *
    * Scale shape: NO global sort — shard assignment is a hash, so the
    * physical write is `repartition(nShards, shard_id)` +
    * `sortWithinPartitions(key)`: one hash shuffle and a per-shard
    * (spillable) sort, each shard an independent unit of work. nShards
    * is the scale lever (pick corpus_bytes / shard_bytes); the
    * per-shard window below is the same per-shard sort the write runs.
    *
    * Query face pins BOTH halves of the contract per shard: membership
    * (n_docs / n_words) and ORDER — `first_doc` is the doc at rank 1
    * and `order_checksum` folds every (key, rank) pair, so any engine
    * that permutes a shard differently hash-mismatches. */
  def shuffleShards(spark: SparkSession, dir: String, nShards: Int = 16,
                    seed: String = "graft"): DataFrame = {
    require(nShards > 0, s"nShards=$nShards must be positive")
    val pp = lit(TextHashing.P)
    val base = docs(spark, dir)
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("n_words"))
      .withColumn("skey", md5Long(concat_ws(":", lit(seed), col("doc_id"))))
      .withColumn("shard_id", (col("skey") % nShards).cast("long"))
    val w = Window.partitionBy("shard_id").orderBy(col("skey"), col("doc_id"))
    base
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum(when(col("rk") === 1, col("doc_id"))).as("first_doc"),
        sum(((col("skey") % pp) * (col("rk") % pp)) % pp).as("order_checksum"))
      .orderBy("shard_id")
  }

  /** Rendezvous (highest-random-weight) shard assignment: a doc's shard
    * among k is argmax over shards of md5("rdv:<shard>:<doc>") — the
    * sharding scheme whose RESIZE cost is provably minimal: growing
    * k -> k+1 moves ONLY the docs whose new shard's hash beats all old
    * ones (expected 1/(k+1) of the corpus), and every moved doc moves
    * TO the new shard — nothing reshuffles between old shards. For an
    * incremental corpus that means re-embedding / re-indexing 6% of
    * docs on a 16 -> 17 rescale instead of ~94% under mod-k. The query
    * face emits the per-shard movement audit for exactly that rescale;
    * MixingSpec asserts the only-to-the-new-shard property exactly.
    *
    * Scale shape: k hashes per doc (posexplode, k tiny) + a k-row
    * per-doc window — embarrassingly parallel, nothing global. */
  def rendezvousShards(spark: SparkSession, dir: String,
                       k: Int = 16): DataFrame = {
    val d = docs(spark, dir).select("doc_id")
    rendezvousAssign(d, k, "shard_old")
      .join(rendezvousAssign(d, k + 1, "shard_new"), "doc_id")
      .groupBy(col("shard_old").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard_old") =!= col("shard_new"), 1L)
          .otherwise(0L)).as("n_moved"))
      .withColumn("moved_share6",
        floor(col("n_moved").cast("double") / col("n_docs") * lit(1.0e6)
          + lit(0.5)) / lit(1.0e6))
      .orderBy("shard")
  }

  /** The argmax-of-k-hashes core (h desc, shard asc tie order). */
  private[ops] def rendezvousAssign(d: DataFrame, k: Int,
                                    as: String): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    d.select(col("doc_id"), posexplode(array((0 until k).map(s =>
        md5Long(concat(lit(s"rdv:$s:"), col("doc_id")))): _*))
        .as(Seq("s", "h")))
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("h").desc, col("s"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("s").as(as))
  }
}
