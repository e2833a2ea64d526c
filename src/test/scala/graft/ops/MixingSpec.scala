package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the dataset-mixing operators (the DuckDB oracles prove
  * engine parity; these prove the math means what it claims). */
class MixingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("temperature alpha=1 is proportional sampling: every domain rate == frac") {
    val r = Mixing.temperatureMix(spark, dir, "source", alpha = 1.0, frac = 0.4)
      .select("rate").distinct().collect().map(_.getDouble(0))
    assert(r.toSet === Set(0.4))
  }

  test("temperature alpha<1 flattens: smaller domains sample at a higher rate") {
    val sizes = Mixing.docs(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Mixing.temperatureMix(spark, dir, "lang", alpha = 0.5, frac = 0.3)
      .groupBy("lang").agg(min("rate").as("rate"))
      .collect().map(r => r.getAs[Double]("rate") -> sizes(r.getString(0)))
    val byN = rates.sortBy(_._2)
    // rate is non-increasing in domain size (ties allowed at the cap)
    byN.sliding(2).foreach {
      case Array((rSmall, _), (rBig, _)) =>
        assert(rSmall >= rBig, s"flattening violated: ${byN.toSeq}")
      case _ => ()
    }
  }

  test("temperature mix is a pure function of the corpus") {
    val a = Mixing.temperatureMix(spark, dir, "source", 0.5, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Mixing.temperatureMix(spark, dir, "source", 0.5, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  test("quota cap: no domain exceeds the cap, under-cap domains keep everything") {
    val before = Mixing.docs(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Mixing.quotaSample(spark, dir, "lang", cap = 10)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet === before.keySet)
    after.foreach { case (lang, n) =>
      assert(n === math.min(10L, before(lang)), s"lang $lang")
    }
  }

  test("quota survivors are a hash-priority prefix: cap=5 subset of cap=10") {
    def kept(cap: Int) = Mixing.quotaSample(spark, dir, "lang", cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val k5 = kept(5)
    val k10 = kept(10)
    assert(k5.subsetOf(k10))
  }

  test("quota two-phase pre-rank is exact: salts=1 == salts=32") {
    def ids(s: Int) = Mixing.quotaSampleDf(Mixing.docs(spark, dir), "lang", 10, salts = s)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(1) === ids(32))
  }

  test("weighted sample: k rows, keys in [0,1], prefix-stable in k") {
    val top = Mixing.weightedSample(spark, dir, "n_chars", k = 10)
      .select("doc_id", "w_key").collect()
    assert(top.length === 10)
    assert(top.forall(r => { val k = r.getDouble(1); k >= 0.0 && k <= 1.0 }))
    val wider = Mixing.weightedSample(spark, dir, "n_chars", k = 15)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(wider.take(10) === top.map(_.getLong(0)).toSeq)
  }

  test("epoch repeat: upsampled domains emit whole copies plus a deterministic remainder") {
    import spark.implicits._
    val d = ((0 until 100).map(i => (i.toLong, s"big doc number $i", "big")) ++
      Seq((1000L, "tiny one", "sm"), (1001L, "tiny two", "sm")))
      .toDF("doc_id", "text", "source")
    val out = Mixing.epochRepeatMixDf(d, "source", alpha = 0.5, frac = 0.5)
    val rates = out.select("source", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("sm") > 1.0, s"tiny domain must upsample under alpha<1: $rates")
    // every emitted tiny-domain doc appears floor(rate) or floor(rate)+1 times
    val counts = out.filter(col("source") === "sm").groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fl = math.floor(rates("sm")).toLong
    assert(counts.values.forall(c => c == fl || c == fl + 1),
      s"copy counts must be floor or floor+1 of rate ${rates("sm")}: $counts")
    // epoch indexes are a contiguous 0-based range per doc
    for ((id, c) <- counts) {
      val ep = out.filter(col("doc_id") === id).select("epoch")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ep === (0L until c).toSeq, s"epochs of $id not contiguous: $ep")
    }
    // pure function of the corpus
    assert(Mixing.epochRepeatMixDf(d, "source", 0.5, 0.5).count() === out.count())
  }

  test("weighted sample threshold plan == top-k plan, row for row") {
    val base = Mixing.docs(spark, dir)
      .filter(col("n_chars") > 0)
      .withColumn("w_key", round(pow(Mixing.unitHash(col("text")),
        lit(1.0) / col("n_chars")), 6))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    for (k <- Seq(1, 10, 57, 200)) {
      val top = base.orderBy(col("w_key").desc, col("doc_id").asc).limit(k)
      assert(ids(Mixing.weightedSampleByThreshold(base, k)) === ids(top),
        s"threshold selection diverged from top-k at k=$k")
    }
    // k past the corpus: every surviving row, no error
    val n = base.count()
    assert(Mixing.weightedSampleByThreshold(base, (n + 100).toInt).count() === n)
    // degenerate all-tied keys: the tie trim IS the whole selection
    val tied = base.withColumn("w_key", lit(0.5))
    assert(ids(Mixing.weightedSampleByThreshold(tied, 7)) ===
      ids(tied.orderBy(col("w_key").desc, col("doc_id").asc).limit(7)))
  }

  test("pack: shard assignment is partition-count invariant (the prefix sum is exact)") {
    import spark.implicits._
    val tok = (0L until 97L).map(i => (i, 1L + (i * 7) % 23)).toDF("doc_id", "n_tok")
    def packed(p: Int) = Mixing.packShards(tok, "doc_id", "n_tok", budget = 50L, numPartitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val one = packed(1)
    assert(packed(7) === one)
    assert(packed(32) === one)
  }

  test("pack: shards are contiguous in id, capped at budget + one crossing doc") {
    import spark.implicits._
    val tok = (0L until 200L).map(i => (i, 1L + (i * 13) % 40)).toDF("doc_id", "n_tok")
    val maxDoc = 40L
    val budget = 100L
    val rows = Mixing.packShards(tok, "doc_id", "n_tok", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // shard ids never decrease as doc ids grow (contiguity)
    rows.sliding(2).foreach {
      case Array((_, _, s1), (_, _, s2)) => assert(s1 <= s2)
      case _ => ()
    }
    // per-shard totals stay under budget + the one doc that crosses
    rows.groupBy(_._3).foreach { case (shard, docs) =>
      val total = docs.map(_._2).sum
      assert(total < budget + maxDoc, s"shard $shard overflows: $total")
    }
    // every doc lands in exactly one shard
    assert(rows.length === 200)
  }

  test("pack: budget respected under the trained-BPE token column") {
    // feed packShards tokenizer-aware counts instead of word counts:
    // the budget bound must hold against the BPE totals, and the shard
    // assignment must equal a plain prefix-sum over those counts
    val tok = graft.ops.TextAnalysis.bpeTokenCounts(spark, dir)
    val budget = 200L
    val rows = Mixing.packShards(tok, "doc_id", "n_tokens", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    val maxDoc = rows.map(_._2).max
    rows.groupBy(_._3).foreach { case (shard, docs) =>
      assert(docs.map(_._2).sum < budget + maxDoc, s"BPE shard $shard overflows")
    }
    var cum = 0L
    rows.foreach { case (id, t, shard) =>
      assert(shard === cum / budget, s"doc $id shard mismatch under BPE counts")
      cum += t
    }
  }

  test("pack: empty input and oversized docs degrade sanely") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tok")
    assert(Mixing.packShards(empty, "doc_id", "n_tok", 10L).count() === 0)
    // a doc larger than the budget occupies its shard alone (never split)
    val big = Seq((0L, 5L), (1L, 100L), (2L, 5L)).toDF("doc_id", "n_tok")
    val m = Mixing.packShards(big, "doc_id", "n_tok", 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(0L) === 0L && m(1L) === 0L && m(2L) === 10L)
    intercept[IllegalArgumentException] {
      Mixing.packShards(big, "doc_id", "n_tok", 0L)
    }
  }

  test("shuffle shards: a deterministic partition of the corpus") {
    val n = Mixing.docs(spark, dir).count()
    val m = Mixing.shuffleShards(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every doc lands in exactly one shard
    assert(m.map(_._2).sum === n)
    assert(m.map(_._1).toSet.subsetOf((0L until 16L).toSet))
    // byte-identical on rerun
    val again = Mixing.shuffleShards(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(m.toSeq === again.toSeq)
  }

  test("shuffle shards: the seed changes the permutation, not the corpus") {
    val a = Mixing.shuffleShards(spark, dir, seed = "graft").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val b = Mixing.shuffleShards(spark, dir, seed = "other").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // total membership is seed-invariant...
    assert(a.map(_._2).sum === b.map(_._2).sum)
    // ...but the permutation is not: some shard differs in members or order
    assert(a.toSeq !== b.toSeq, "seed had no effect on the shuffle")
  }

  test("shuffle shards: first_doc is the shard's key-order head") {
    import graft.ops.TextHashing.md5Long
    // recompute the key order driver-side and check rank-1 per shard
    val keyed = Mixing.docs(spark, dir)
      .select(col("doc_id"), md5Long(concat_ws(":", lit("graft"), col("doc_id"))).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectHead = keyed.groupBy(_._2 % 16)
      .map { case (s, ds) => s -> ds.minBy(d => (d._2, d._1))._1 }
    val firstDocs = Mixing.shuffleShards(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    expectHead.foreach { case (s, d) =>
      assert(firstDocs(s) === d, s"shard $s head mismatch")
    }
  }

  test("rendezvous sharding: rescale moves docs ONLY to the new shard") {
    val d = Mixing.docs(spark, dir).select("doc_id")
    val old16 = Mixing.rendezvousAssign(d, 16, "s_old")
    val new17 = Mixing.rendezvousAssign(d, 17, "s_new")
    val moved = old16.join(new17, "doc_id")
      .filter(col("s_old") =!= col("s_new")).collect()
    assert(moved.nonEmpty, "a rescale must move someone")
    // the defining HRW property: every moved doc lands on shard 16
    assert(moved.forall(_.getAs[Int]("s_new") === 16),
      s"moved docs must only go to the NEW shard: ${moved.take(5).toSeq}")
    // movement is ~1/17 of docs, not ~16/17 like mod-k resharding
    val n = d.count().toDouble
    assert(moved.length < n * 2 / 17,
      s"${moved.length} moved of $n — far above the 1/17 expectation")
    // assignment is total and deterministic
    assert(old16.count() === n.toLong)
    assert(Mixing.rendezvousAssign(d, 16, "s2").join(old16, "doc_id")
      .filter(col("s2") =!= col("s_old")).count() === 0L)
  }
}
