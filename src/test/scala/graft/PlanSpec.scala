package graft

import graft.queries.{MarketQueries, RelationalQueries}
import graft.ops.{TextDedup, Similarity}

/** Physical-plan guardrails — the properties that keep these operators
  * viable at 100 TB (VERDICT round-1 scale constraints):
  *   - no CartesianProduct anywhere in the dedup/similarity family;
  *   - tiny dims join via broadcast, not shuffle;
  *   - top-k lowers to TakeOrderedAndProject, not global sort + limit.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dedup family: no cartesian products, ever") {
    for (df <- Seq(
        TextDedup.ngramJaccard(spark, dir),
        TextDedup.minhashLsh(spark, dir),
        TextDedup.simhash(spark, dir),
        TextDedup.simhashClusters(spark, dir), // incl. the component-loop joins
        TextDedup.minhashClusters(spark, dir),
        TextDedup.ngramClusters(spark, dir),
        TextDedup.minhashEst(spark, dir), // round-6 banded estimator query
        graft.ops.TextHashing.jaccardPairsPPJoin(
          TextDedup.docs(spark, dir), TextDedup.JaccardThreshold), // round-7 lossless filter
        Similarity.embeddingNearDup(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$p")
    }
  }

  test("curation near-dup gate: equality joins only, no cartesian against the index") {
    import org.apache.spark.sql.types._
    def empty(schema: StructType) = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val bands = empty(StructType(Seq(
      StructField("doc_id", LongType), StructField("band", IntegerType),
      StructField("band_key", StringType))))
    val sigs = empty(StructType(Seq(
      StructField("doc_id", LongType), StructField("sig", ArrayType(LongType)))))
    val (survivors, _) = graft.ops.CurationPipeline.incrementalNearDedup(
      TextDedup.docs(spark, dir).select("doc_id", "text"), bands, sigs)
    val p = plan(survivors)
    assert(!p.contains("CartesianProduct"), s"cartesian in near-dup gate:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in near-dup gate:\n$p")
    // the embedding-modality gate: bucket-equality candidates only
    val vecIdx = empty(StructType(Seq(
      StructField("vec_id", LongType), StructField("bkt", LongType),
      StructField("v", ArrayType(DoubleType)), StructField("nrm", DoubleType))))
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val (vSurv, _) = Similarity.incrementalNearDup(vecs, vecIdx, threshold = 0.9)
    val vp = plan(vSurv)
    assert(!vp.contains("CartesianProduct"), s"cartesian in vector gate:\n$vp")
    assert(!vp.contains("BroadcastNestedLoopJoin"), s"nested-loop join in vector gate:\n$vp")
  }

  test("decontamination: the benchmark side broadcasts (candidates AND verification)") {
    val p = plan(TextDedup.decontamination(spark, dir))
    // a real benchmark set is tiny vs the training corpus — both its
    // band table (candidate join) and its signature table (verify join)
    // must broadcast so the corpus side never shuffles for them; the
    // explicit hint makes the plan shape scale-invariant rather than
    // whatever AQE picks at fixture size
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"benchmark-side join must not shuffle-join at any scale:\n$p")
  }

  test("chunking is a pure narrow projection: no exchange anywhere in the plan") {
    val p = plan(ops.TextAnalysis.chunkDocumentsDf(ops.TextAnalysis.docs(spark, dir), 64, 8))
    assert(!p.contains("Exchange"), s"chunk explosion must not shuffle:\n$p")
    assert(!p.contains("Sort"), s"the unsorted core must not sort:\n$p")
  }

  test("exact n-gram contamination: benchmark grams broadcast, corpus never shuffles for the join") {
    val p = plan(TextDedup.decontaminationNgram(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast gram join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the gram join must not shuffle the corpus at any scale:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in contamination plan:\n$p")
  }

  test("bloom decontamination: might_contain prefilter ahead of the candidate shuffle") {
    val p = plan(TextDedup.decontaminationBloom(spark, dir))
    assert(p.toLowerCase.contains("might_contain"),
      s"expected the bloom prefilter on the corpus gram stream:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast confirm join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the confirm join must not shuffle the corpus at any scale:\n$p")
    // the first shuffle (the n_hits aggregate's exchange — per-doc gram
    // dedup is narrow array_distinct, so no distinct shuffle exists)
    // must sit ABOVE the bloom filter (tree prints root-first, so
    // upstream ops have LARGER indices): every exchanged row is a bloom
    // survivor, never the raw gram set
    val filterIdx = p.toLowerCase.indexOf("might_contain")
    val shuffleIdx = p.indexOf("Exchange hashpartitioning")
    assert(shuffleIdx >= 0, s"expected a candidate-set exchange:\n$p")
    assert(filterIdx > shuffleIdx,
      s"bloom filter must be upstream of the first shuffle:\n$p")
  }

  test("per-doc shingle/gram dedup is narrow: no corpus-wide distinct exchange") {
    // distinctness of (doc_id, shingle)/(doc_id, gram) is per document,
    // so it must be array_distinct before the explode — a global
    // .distinct() here shuffled every pair in the corpus (~50 GB of
    // spill at sf100 for the word-level equivalent in simhashSigs)
    val shP = plan(graft.ops.TextHashing.docShingles(TextDedup.docs(spark, dir)))
    assert(!shP.contains("Exchange"), s"docShingles must be shuffle-free:\n$shP")
    // exact contamination: scan -> narrow gram dedup -> broadcast
    // confirm -> ONE hash exchange (the n_hits aggregate, which only
    // carries confirmed hits); a second hashpartitioning would mean the
    // gram distinct came back
    val exP = plan(TextDedup.decontaminationNgram(spark, dir))
    val nHash = "Exchange hashpartitioning".r.findAllIn(exP).size
    assert(nHash == 1,
      s"expected exactly the n_hits aggregate exchange, got $nHash:\n$exP")
  }

  test("similarity top-k: query side broadcast, no shuffle of the corpus for the join") {
    val p = plan(Similarity.bruteForceTopK(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("dim enrichment joins are broadcast hash joins") {
    for (df <- Seq(
        MarketQueries.enrichedBySegment(spark, dir),
        RelationalQueries.topOrders(spark, dir),
        RelationalQueries.revenueByRegion(spark, dir))) {
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
      assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
    }
  }

  test("new query surface stays cartesian-free") {
    for (df <- Seq(
        graft.ops.Similarity.lshMultiProbeTopK(spark, dir),
        graft.ops.Similarity.lshMultiTableTopK(spark, dir),
        graft.ops.Similarity.ivfTopK(spark, dir),
        graft.ops.ScalarQuant.sqRerank(spark, dir),
        graft.ops.TextRanking.bm25TopK(spark, dir, Seq("spark", "window"), 10),
        graft.ops.TextRanking.hybridRrfTopK(spark, dir, Seq(0L, 1L, 2L), 10),
        MarketQueries.inactiveTokens(spark, dir),
        RelationalQueries.brandRevenue(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    }
    assert(plan(RelationalQueries.brandRevenue(spark, dir)).contains("BroadcastHashJoin"))
  }

  test("round-11 curation operators: cartesian-free, model tables broadcast") {
    // NOTE: the scorers attach their O(1) corpus scalars (totals, N+V)
    // via crossJoin(broadcast(one-row)) — that plans as a
    // BroadcastNestedLoopJoin against a 1-row build side, which is the
    // intended scalar attach, so only CartesianProduct is banned here;
    // substring dedup has no scalar attach and gets the stricter gate
    for (df <- Seq(
        graft.ops.Importance.importanceTopK(spark, dir),
        graft.ops.TextAnalysis.unigramSurprisal(spark, dir),
        graft.ops.TextAnalysis.bigramSurprisal(spark, dir),
        graft.ops.QualityClassifier.classifierScores(spark, dir, rounds = 1))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    }
    val sub = plan(graft.ops.SubstringDedup.substringDedupStats(spark, dir))
    assert(!sub.contains("CartesianProduct"), s"cartesian in:\n$sub")
    assert(!sub.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$sub")
    // the O(B) weight/model tables come back over broadcast, not shuffle
    assert(plan(graft.ops.Importance.importanceTopK(spark, dir))
      .contains("BroadcastHashJoin"))
    // importance top-k lowers to TakeOrderedAndProject, not sort+limit
    assert(plan(graft.ops.Importance.importanceTopK(spark, dir))
      .contains("TakeOrderedAndProject"))
  }

  test("round-11 continuation operators: cartesian-free, bucket joins stay equality joins") {
    // scalar-attach crossJoin(broadcast(1-row)) is the intended shape
    // for the stats/total attaches (curriculum, reweight) — only
    // CartesianProduct is banned there; the bucket-join family gets the
    // stricter no-nested-loop gate
    for (df <- Seq(
        graft.ops.Similarity.knnLabelPropagation(spark, dir),
        graft.ops.Similarity.clusterBalancedSample(spark, dir),
        graft.ops.TextDedup.contrastiveHardNegatives(spark, dir),
        graft.ops.TextDedup.ngramDuplicationProfile(spark, dir),
        graft.ops.TextAnalysis.hllGramCardinality(spark, dir),
        graft.ops.TextAnalysis.tokenEntropy(spark, dir),
        graft.ops.TextAnalysis.bpeFertility(spark, dir),
        graft.ops.TextAnalysis.corpusDrift(spark, dir),
        MarketQueries.priceJumps(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    }
    // the KNN vote and the hard-negative mine join on the sign bucket —
    // equality hash joins, never a nested loop over the corpus
    for (df <- Seq(
        graft.ops.Similarity.knnLabelPropagation(spark, dir),
        graft.ops.TextDedup.contrastiveHardNegatives(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$p")
      assert(p.contains("HashJoin"), s"no hash join in:\n$p")
    }
    // per-vector top-k pushes into the window operator
    assert(plan(graft.ops.Similarity.knnLabelPropagation(spark, dir))
      .contains("WindowGroupLimit"))
  }

  test("semantic decontamination: bench side broadcasts, corpus never shuffles") {
    val p = plan(Similarity.semanticDecontamination(spark, dir))
    // the eval-suite side is bounded; the corpus leg must stream once
    // through a broadcast — a shuffle here would move the 100 TB side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected the bench side broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("BPE encode: vocab joins broadcast, the only sort is per-document") {
    val p = plan(ops.TextAnalysis.bpeEncode(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the word->syms join must not shuffle the doc words:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("shuffle shards: hash shuffle + per-shard sort, no global sort") {
    val df = ops.Mixing.shuffleShards(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"joins have no business here:\n$p")
    // the corpus-sized window must partition by shard_id over a HASH
    // exchange — a range exchange there would serialize the 100 TB
    // corpus through one global ordering. (The only range exchange
    // allowed is the final orderBy over the 16-row manifest.)
    assert(p.contains("hashpartitioning(shard_id"), s"expected hash exchange:\n$p")
    val ranges = "rangepartitioning".r.findAllIn(p).length
    assert(ranges <= 1, s"corpus-sized range exchange leaked into the plan:\n$p")
  }

  test("range join is a bucketized equality join, never a nested loop") {
    val p = plan(MarketQueries.rangeJoinErrors(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bare range predicate planned as nested loop:\n$p")
  }

  test("as-of join plans as union + window: one shuffle, no join operator") {
    val p = plan(MarketQueries.asofJoin(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range-join blowup in as-of plan:\n$p")
    // the whole point of the formulation: there is NO pairwise join node —
    // right-side values travel through a running window fill
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"as-of join must not shuffle-join the two sides:\n$p")
    assert(p.contains("Window"), s"expected a window fill:\n$p")
  }

  test("top-k queries lower to TakeOrderedAndProject") {
    for (df <- Seq(
        MarketQueries.latestTick(spark, dir),
        MarketQueries.latestPricesTopK(spark, dir))) {
      val p = plan(df)
      assert(p.contains("TakeOrderedAndProject"), s"expected top-k fusion:\n$p")
    }
  }

  test("point-lookup filter is pushed to the parquet scan") {
    val p = plan(MarketQueries.latestTick(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]")
      || p.contains("EqualTo(user_id,7)"), s"filter not pushed:\n$p")
  }

  test("narrow projection prunes the scan schema") {
    val p = plan(MarketQueries.scaledProjection(spark, dir))
    assert(!p.contains("event_type"), s"scan reads pruned column:\n$p")
  }
}
