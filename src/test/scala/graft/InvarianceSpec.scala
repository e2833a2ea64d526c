package graft

import graft.ops.{TextDedup, Similarity}
import graft.queries.MarketQueries
import org.apache.spark.sql.functions._

/** Distribution invariance (SURVEY §5.2): results must not depend on
  * physical partitioning — the property that makes "works on local[32]"
  * transfer to a 1000-executor cluster. */
class InvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("token stats identical under different partitioning") {
    val base = MarketQueries.tokenStats(spark, dir).collect().toSeq
    val once = MarketQueries.events(spark, dir).repartition(1)
    val wide = MarketQueries.events(spark, dir).repartition(16, col("event_id"))
    def statsOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("user_id")
      .agg(min("value").as("min_price"), max("value").as("max_price"),
        (sum(col("value").cast("decimal(20,6)")).cast("double") / count(lit(1))).as("avg_price"),
        round(sum("value"), 3).as("total_value"),
        count(lit(1)).as("tick_count"), unix_micros(max(col("ts"))).as("last_update_us"))
      .orderBy("user_id").collect().toSeq
    assert(statsOf(once) === base)
    assert(statsOf(wide) === base)
  }

  test("salted aggregation handles a pathologically hot key") {
    import spark.implicits._
    // hot-key fixture: one token carries 50% of 100k rows (the adversarial
    // distribution for a plain groupBy — one reducer gets half the data)
    val n = 100000
    val skewed = spark.range(n.toLong).select(
      when(col("id") % 2 === 0, lit("HOT"))
        .otherwise(concat(lit("t"), col("id") % 64)).as("token"),
      col("id").as("volume"))

    val direct = skewed.groupBy("token")
      .agg(sum("volume").as("total"), count(lit(1)).as("cnt"))
      .orderBy("token").collect().toSeq
    val salted = graft.ops.Skew.saltedSumCount(skewed, col("token"), col("volume"), 16)
      .withColumnRenamed("k", "token")
      .withColumnRenamed("total", "total")
      .orderBy("token").collect().toSeq
    assert(direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ===
      salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))),
      "salted two-phase agg must equal the direct agg on skewed data")

    // the mechanism: phase 1's (key, salt) groups actually SPREAD the hot
    // key — no partial group may exceed ~hot/buckets by more than 50%
    val hotCount = n / 2
    val buckets = 16
    def assertSpread(df: org.apache.spark.sql.DataFrame): Unit = {
      val phase1 = df
        .groupBy(col("token"), graft.ops.Skew.saltCol(col("volume"), buckets).as("salt"))
        .agg(count(lit(1)).as("c"))
        .filter(col("token") === "HOT")
        .collect()
      assert(phase1.length === buckets, "hot key must hit every salt bucket")
      val maxGroup = phase1.map(_.getAs[Long]("c")).max
      assert(maxGroup <= (hotCount / buckets * 1.5).toLong,
        s"hot key not spread: max salted group $maxGroup vs ideal ${hotCount / buckets}")
    }
    assertSpread(skewed)

    // the adversarial sub-case: the hot key's VALUE is constant, so a
    // value-only salt would put every hot row in ONE bucket
    val constSkewed = skewed.withColumn("volume",
      when(col("token") === "HOT", lit(7L)).otherwise(col("volume")))
    val directC = constSkewed.groupBy("token")
      .agg(sum("volume").as("total"), count(lit(1)).as("cnt"))
      .orderBy("token").collect().toSeq
    val saltedC = graft.ops.Skew.saltedSumCount(constSkewed, col("token"), col("volume"), buckets)
      .withColumnRenamed("k", "token").orderBy("token").collect().toSeq
    assert(directC.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ===
      saltedC.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    assertSpread(constSkewed)
  }

  test("as-of join matches the brute-force definition on synthetic data") {
    import spark.implicits._
    // deterministic pseudo-random tables: 500 points, 200 quotes, 7 keys
    val points = spark.range(500).select(
      (col("id") % 7).as("k"), (col("id") * 37 % 1000).as("ts"), col("id").as("pid"))
    val quotes = spark.range(200).select(
      (col("id") % 7).as("k"), (col("id") * 53 % 1000).as("ts"),
      (col("id") % 89).cast("double").as("px"))
      .groupBy("k", "ts").agg(max("px").as("px"))

    val got = graft.ops.AsofJoin.joinAsof(points, quotes, "k", "ts", Seq("px"))
      .select("pid", "asof_px").as[(Long, Option[Double])].collect().toMap

    // brute force on the driver: latest quote at-or-before, per key
    val qs = quotes.as[(Long, Long, Double)].collect().groupBy(_._1)
    val ps = points.as[(Long, Long, Long)].collect()
    ps.foreach { case (k, ts, pid) =>
      val expect = qs.getOrElse(k, Array.empty)
        .filter(_._2 <= ts).sortBy(_._2).lastOption.map(_._3)
      assert(got(pid) === expect, s"pid=$pid k=$k ts=$ts")
    }
  }

  test("as-of join survives a pathologically hot key (sub-quadratic by construction)") {
    import spark.implicits._
    // the InvarianceSpec skew fixture, applied to the as-of join: one key
    // carries 50% of both sides. A range-join formulation enumerates
    // |L_hot|*|R_hot| = 50k*10k candidate pairs here; the union+window
    // formulation does (|L_hot|+|R_hot|)*log work. First, the structural
    // fact that GUARANTEES sub-quadratic: the plan has no join node at
    // all — only a union, one shuffle on the key, and a window sort.
    val nL = 100000L
    val nR = 20000L
    val points = spark.range(nL).select(
      when(col("id") % 2 === 0, lit("HOT"))
        .otherwise(concat(lit("t"), col("id") % 64)).as("k"),
      (col("id") * 37 % 100000).as("ts"), col("id").as("pid"))
    val quotes = spark.range(nR).select(
      when(col("id") % 2 === 0, lit("HOT"))
        .otherwise(concat(lit("t"), col("id") % 64)).as("k"),
      (col("id") * 53 % 100000).as("ts"), (col("id") % 997).cast("double").as("px"))
      .groupBy("k", "ts").agg(max("px").as("px"))

    val joined = graft.ops.AsofJoin.joinAsof(points, quotes, "k", "ts", Seq("px"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      "as-of must stay the union+window formulation — any join node " +
        "reintroduces per-key candidate pairs and dies on the hot key")

    val t0 = System.nanoTime()
    val got = joined.select("pid", "asof_px").as[(Long, Option[Double])].collect().toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"hot-key as-of: ${nL} x ${nR} rows (50%% on one key) in $secs%.1f s")
    assert(secs < 120.0, f"hot-key as-of took $secs%.1f s — quadratic blowup signature")
    assert(got.size.toLong === nL)

    // spot-check correctness against a driver-side binary search on the
    // hot key and two cold keys
    val qs = quotes.as[(String, Long, Double)].collect().groupBy(_._1)
      .map { case (k, arr) => k -> arr.sortBy(_._2) }
    val sample = points.as[(String, Long, Long)].collect()
      .filter(p => p._1 == "HOT" || p._1 == "t3" || p._1 == "t17")
      .take(2000)
    sample.foreach { case (k, ts, pid) =>
      val expect = qs.getOrElse(k, Array.empty[(String, Long, Double)])
        .takeWhile(_._2 <= ts).lastOption.map(_._3)
      assert(got(pid) === expect, s"pid=$pid k=$k ts=$ts")
    }
  }

  test("as-of join is collision-safe: user columns named _src/_r_*/asof_* handled") {
    import spark.implicits._
    // left already uses the old internal names — results must be as if
    // they were ordinary payload columns
    val left = Seq(("a", 10L, "L1", 7L), ("a", 20L, "L2", 8L))
      .toDF("k", "ts", "_src", "_r_px")
    val right = Seq(("a", 5L, 1.5), ("a", 15L, 2.5)).toDF("k", "ts", "px")
    val out = graft.ops.AsofJoin.joinAsof(left, right, "k", "ts", Seq("px"))
    assert(out.columns.toSeq === Seq("k", "ts", "_src", "_r_px", "asof_px"))
    val rows = out.orderBy("ts").collect()
    assert(rows.map(_.getAs[String]("_src")).toSeq === Seq("L1", "L2"),
      "user column _src must pass through untouched")
    assert(rows.map(_.getAs[Double]("asof_px")).toSeq === Seq(1.5, 2.5))
    // an output-name collision cannot be silently shadowed
    val bad = left.withColumnRenamed("_src", "asof_px")
    val e = intercept[IllegalArgumentException] {
      graft.ops.AsofJoin.joinAsof(bad, right, "k", "ts", Seq("px"))
    }
    assert(e.getMessage.contains("asof_px"))
  }

  test("bucketized range join equals the unbucketized formulation") {
    val points = spark.range(2000).select(
      (col("id") % 11).as("k"), (col("id") * 37 % 5000).as("ts"), col("id").as("pid"))
    val intervals = spark.range(300).select(
      (col("id") % 11).as("k"), (col("id") * 101 % 5000).as("lo"), col("id").as("iid"))
      .withColumn("hi", col("lo") + (col("iid") % 400) + 1)
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = collectPairs(graft.ops.RangeJoin.pointInInterval(
      points, intervals, "k", "ts", "lo", "hi"))
    for (bucket <- Seq(7L, 100L, 10000L)) { // widths below/at/above interval span
      val bucketed = collectPairs(graft.ops.RangeJoin.pointInIntervalBucketed(
        points, intervals, "k", "ts", "lo", "hi", bucket))
      assert(bucketed === plain, s"bucketWidth=$bucket diverged")
    }
    assert(plain.nonEmpty, "fixture must actually produce matches")
  }

  test("jaccard pairs bounded and symmetric-by-construction") {
    val pairs = TextDedup.ngramJaccard(spark, dir).collect()
    assert(pairs.forall { r =>
      val j = r.getAs[Double]("jaccard")
      j >= TextDedup.JaccardThreshold && j <= 1.0 && r.getLong(0) < r.getLong(1)
    })
  }

  test("minhash candidates are a subset of true jaccard pairs") {
    val mh = TextDedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = TextDedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(truth))
    info(s"minhash recall on sf0.001: ${mh.size}/${truth.size}")
  }

  test("LSH top-k is a subset of brute-force candidates per query") {
    val bf = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every LSH hit shares the query's bucket; it may miss brute-force
    // winners from other buckets but must never invent similarities
    val bfAll = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("cos_sim"))).toMap
    val lshScores = Similarity.lshTopK(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("cos_sim")))
    lshScores.foreach { case (k, s) =>
      bfAll.get(k).foreach(bfScore => assert(bfScore === s))
    }
  }

  test("substring-dedup spans identical under different partitioning") {
    val docs = graft.ops.SubstringDedup.docs(spark, dir)
    def spansOf(d: org.apache.spark.sql.DataFrame) =
      graft.ops.SubstringDedup.removedSpans(d)
        .orderBy("doc_id", "s").collect().toSeq
    val base = spansOf(docs)
    assert(base.nonEmpty) // fixture corpus has repeated 10-word spans
    assert(spansOf(docs.repartition(1)) === base)
    assert(spansOf(docs.repartition(16, col("doc_id"))) === base)
  }

  test("price jumps: flagged set equals an exhaustive driver-side 3-sigma recount") {
    val flagged = MarketQueries.priceJumps(spark, dir).collect()
      .map(_.getAs[Long]("event_id")).toSet
    // recompute per-token bands exhaustively with the same round-6
    // decimal discipline
    val rows = MarketQueries.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def d6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = rows.groupBy(_._1).flatMap { case (_, ts) =>
      val ordered = ts.sortBy(t => (t._3, t._2))
      val rets = ordered.zip(ordered.drop(1)).map { case (a, b) => (b._2, d6(b._4 - a._4)) }
      if (rets.isEmpty) Seq.empty[Long]
      else {
        val n = rets.length
        val mean = rets.map(_._2).sum.toDouble / n
        val ex2 = rets.map(r => r._2 * r._2).sum.toDouble / n
        val sdev = math.sqrt(ex2 - mean * mean)
        rets.filter(r => math.abs(r._2.toDouble - mean) > 3.0 * sdev).map(_._1).toSeq
      }
    }.toSet
    assert(flagged === expected)
    assert(flagged.nonEmpty, "sf0.001 must plant at least one jump")
  }

  test("ewma prices: exhaustive dyadic recount is BIT-exact (==, no tolerance)") {
    val got = MarketQueries.ewmaPrices(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val rows = MarketQueries.events(spark, dir)
      .filter(col("user_id").isin(MarketQueries.Tokens: _*))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).flatMap { case (_, ts) =>
      val v = ts.sortBy(t => (t._3, t._2))
      (15 until v.length).map { i =>
        // the engines' exact term order: newest/2 + ... + oldest/2^15 twice
        var acc = v(i)._4 / 2
        for (j <- 1 until 15) acc += v(i - j)._4 / (1L << (j + 1))
        acc += v(i - 15)._4 / 32768L
        v(i)._2 -> acc
      }
    }
    assert(got.size === expected.size)
    for ((eid, e) <- expected)
      assert(got(eid) == e, s"event $eid: ${got(eid)} != $e (must be bit-exact)")
  }

  test("vwap daily: exact decimal recount of price x size sums") {
    val got = MarketQueries.vwapDaily(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val rows = MarketQueries.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).cast("string"),
        get_json_object(col("props"), "$.k").cast("long"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(t => (t._1, t._2)).flatMap { case (k, ts) =>
      val qty = ts.map(_._3).sum
      if (qty <= 0) None else {
        val pv = ts.map(t => BigDecimal(t._4).setScale(2, BigDecimal.RoundingMode.HALF_UP) * t._3).sum
        val vwap = math.floor(pv.toDouble / qty * 1.0e6 + 0.5) / 1.0e6
        Some(k -> ((ts.length.toLong, qty, vwap)))
      }
    }
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("driver entry contract: the flagship query returns rows at sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0L)
  }

  test("approx_count_distinct lands within its error bound") {
    val e = MarketQueries.events(spark, dir)
    val exact = e.select(countDistinct("user_id")).head().getLong(0)
    val approx = e.select(approx_count_distinct("user_id", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }
}
