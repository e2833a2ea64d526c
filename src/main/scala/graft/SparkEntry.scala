package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{MarketQueries => M, RelationalQueries => R}
import graft.ops.{TextDedup, TextAnalysis, TextRanking, Similarity, ScalarQuant, Multimodal, CurationPipeline, Mixing, SubstringDedup, Importance, QualityClassifier}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * (same column names, same deterministic ordering, same rounding).
  * Portability conventions shared by both sides:
  *   - timestamps out as epoch micros (Spark unix_micros / DuckDB epoch_us)
  *   - dates out as ISO strings
  *   - accumulating double aggs rounded (3-6 decimals)
  *   - string hashing via md5 (identical in both engines); 60-bit integer
  *     hashes = first 15 md5 hex chars parsed as int
  */
object SparkEntry {

  /** Flagship query (daily OHLCV, SURVEY §2.5 A3) on sf0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    M.dailyOhlcv(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- market/tick parity surface (SURVEY §2) --
    "latest_tick" -> (M.latestTick _),
    "daily_stats" -> (M.dailyStats _),
    "token_freshness" -> (M.tokenFreshness _),
    "latest_prices_topk" -> (M.latestPricesTopK _),
    "daily_ohlcv" -> (M.dailyOhlcv _),
    "volume_profile" -> (M.volumeProfile _),
    "enriched_by_segment" -> (M.enrichedBySegment _),
    "scaled_projection" -> (M.scaledProjection _),
    "time_range_scan" -> (M.timeRangeScan _),
    "token_stats" -> (M.tokenStats _),
    "mode_conditional" -> (M.modeConditional _),
    "asof_price" -> (M.asofPrice _),
    "tick_returns" -> (M.tickReturns _),
    // anomaly face of the window family: per-token 3-sigma return
    // outliers with z-scores, band edges from exact decimal sums
    "price_jumps" -> (M.priceJumps _),
    // 16-tick dyadic EWMA (bit-identical cross-engine, no rounding)
    "ewma_prices" -> (M.ewmaPrices _),
    // daily VWAP with props.k as trade size (exact decimal p x q)
    "vwap_daily" -> (M.vwapDaily _),
    // morton-interleave layout key (two-dimension storage sort)
    "zorder_key" -> ((s: SparkSession, d: String) => M.zorderKey(s, d)),
    "set_ops" -> (M.setOps _),
    "rollup_stats" -> (M.rollupStats _),
    "distinct_counts" -> (M.distinctCounts _),
    "json_props" -> (M.jsonProps _),
    "time_format" -> (M.timeFormat _),
    "percentiles" -> (M.percentiles _),
    // fixed-size mergeable quantile histogram (B counters per group)
    // beside the exact interpolated legs — the 100 TB percentile path
    "quantile_sketch" -> ((s: SparkSession, d: String) =>
      graft.ops.QuantileSketch.quantileSketch(s, d)),
    // ONE-PASS adaptive sibling: log-bucket (HDR-style) histogram with
    // no [lo, hi) pre-pass — the unknown-domain streaming face's key
    "quantile_sketch_adaptive" -> ((s: SparkSession, d: String) =>
      graft.ops.QuantileSketch.quantileSketchAdaptive(s, d)),
    "session_stats" -> (M.sessionStats _),
    // the engine's built-in session_window (batch face of the
    // streaming construct), vs an independent gap-recipe oracle
    "session_window_agg" -> (M.sessionWindowAgg _),
    "inactive_tokens" -> (M.inactiveTokens _),
    "pivot_counts" -> (M.pivotCounts _),
    "tokens_by_type" -> (M.tokensByType _),
    "hourly_bars" -> (M.hourlyBars _),
    "seq_dedup" -> (M.seqDedup _),
    "asof_join" -> (M.asofJoin _),
    "cum_volume" -> (M.cumulativeVolume _),
    "rank_by_day" -> (M.rankByDay _),
    "event_gaps" -> (M.eventGaps _),
    "cube_stats" -> (M.cubeStats _),
    "range_join_errors" -> (M.rangeJoinErrors _),
    "except_tokens" -> (M.exceptTokens _),
    // -- relational / TPC-H-ish --
    "tpch_pricing_summary" -> (R.pricingSummary _),
    "tpch_top_orders" -> (R.topOrders _),
    "revenue_by_region" -> (R.revenueByRegion _),
    "brand_revenue" -> (R.brandRevenue _),
    "supplier_summary" -> (R.supplierSummary _),
    // -- dedup family --
    "dedup_exact" -> (TextDedup.exact _),
    // normalized exact dedup: punctuation/casing/whitespace variants
    // collapse; n_raw_variants counts what the raw hash missed
    "dedup_exact_normalized" -> (TextDedup.exactNormalized _),
    // 5-iteration PageRank over the verified near-dup pair graph
    // (exact-decimal power iteration; the centrality face of the
    // dedup structure next to connected components)
    "pagerank_neardup" -> ((s: SparkSession, d: String) =>
      ops.GraphOps.pagerankNearDup(s, d)),
    // per-cluster triangle cohesion (template family vs drift chain)
    "triangle_stats" -> ((s: SparkSession, d: String) =>
      ops.GraphOps.triangleStats(s, d)),
    // cross-source duplication matrix over the verified pair table
    "cross_source_dups" -> (TextDedup.crossSourceDups _),
    "dedup_ngram" -> (TextDedup.ngramJaccard _),
    // PPJoin-grade lossless filtering: same output as dedup_ngram by
    // construction (the oracle IS the unfiltered SQL), so the hash gate
    // proves the prefix+length+positional filters drop nothing
    "dedup_ngram_ppjoin" -> ((s: SparkSession, d: String) =>
      TextDedup.ppjoinPairs(s, d).orderBy("doc_a", "doc_b")),
    "dedup_ngram_clusters" -> (TextDedup.ngramClusters _),
    // the sweep knob at a second point: stricter threshold, different
    // pair graph, different fixpoint — same machinery
    "dedup_ngram_clusters_t50" -> ((s: SparkSession, d: String) =>
      TextDedup.ngramClustersAt(s, d, 0.5)),
    "dedup_minhash" -> (TextDedup.minhashLsh _),
    "dedup_minhash_clusters" -> (TextDedup.minhashClusters _),
    "dedup_cluster_histogram" -> (TextDedup.minhashClusterHistogram _),
    // the production keep-rule: best doc per near-dup cluster by
    // (quality desc, id asc), not an arbitrary min-id
    "dedup_keep_best" -> (TextDedup.dedupKeepBest _),
    // leakage-free split audit: near-dup clusters assigned whole
    "leakage_free_split" -> (TextDedup.leakageFreeSplitStats _),
    "dedup_minhash_est" -> (TextDedup.minhashEst _),
    "decontamination" -> (TextDedup.decontamination _),
    // exact 13-gram containment (the verbatim-quote complement of the
    // banded near-dup flagger above)
    "decontamination_ngram" -> (TextDedup.decontaminationNgram _),
    // same rows via the bloom-prefiltered plan (no corpus-gram shuffle;
    // candidates only) — the gate pins that the bloom stage is lossless
    "decontamination_bloom" -> (TextDedup.decontaminationBloom _),
    // embedding-space decontamination: cosine-to-benchmark over a
    // broadcast bench side (catches paraphrases the shingle flaggers miss)
    "decontamination_semantic" -> ((s: SparkSession, d: String) =>
      Similarity.semanticDecontamination(s, d)),
    // substring-level dedup (Lee et al. 2022): repeated 10-word spans
    // keep only their corpus-first occurrence; stats + cleaned-text md5
    "dedup_substring" -> ((s: SparkSession, d: String) =>
      SubstringDedup.substringDedupStats(s, d)),
    // contrastive training pairs from the dedup structure: verified
    // near-dup pair = (anchor, positive); deterministic pool negative
    "contrastive_pairs" -> ((s: SparkSession, d: String) =>
      TextDedup.contrastivePairs(s, d)),
    // the embedding-training upgrade over random negatives: highest-
    // cosine neighbor OUTSIDE the anchor's near-dup cluster
    "contrastive_hard_negatives" -> ((s: SparkSession, d: String) =>
      TextDedup.contrastiveHardNegatives(s, d)),
    "simhash_sigs" -> ((s: SparkSession, d: String) => TextDedup.simhashSigs(s, d).orderBy("doc_id")),
    "dedup_simhash" -> (TextDedup.simhash _),
    "dedup_simhash_clusters" -> (TextDedup.simhashClusters _),
    // FORCED banding levels (r16 verdict #1): every natural corpus at
    // gate scale picks level 0, so these are the only executions of
    // the level-1/2 block-combination band algebra under the DuckDB
    // hash gate (15x16-bit pairs / 20x24-bit triples of 8-bit blocks)
    "dedup_simhash_l1" -> ((s: SparkSession, d: String) => TextDedup.simhashAt(s, d, 1)),
    "dedup_simhash_clusters_l1" -> ((s: SparkSession, d: String) => TextDedup.simhashClustersAt(s, d, 1)),
    "dedup_simhash_clusters_l2" -> ((s: SparkSession, d: String) => TextDedup.simhashClustersAt(s, d, 2)),
    // -- similarity search --
    "similarity_topk" -> (Similarity.bruteForceTopK _),
    "ann_lsh_topk" -> (Similarity.lshTopK _),
    "ann_ivf_topk" -> ((s: SparkSession, d: String) => Similarity.ivfTopK(s, d)),
    // the nprobe recall lever, oracle-verified (not just spec-asserted):
    // probing the 2 best clusters must produce exactly the oracle's rows
    "ann_ivf_nprobe2" -> ((s: SparkSession, d: String) => Similarity.ivfTopK(s, d, nprobe = 2)),
    "ann_pq_topk" -> (Similarity.pqTopK _),
    // the standard PQ deployment shape: ADC shortlist of 20, exact
    // rerank from stored vectors — output similarities are EXACT
    "ann_pq_rerank" -> (Similarity.pqTopKRerank _),
    // the composed 100 TB layout: nprobe-pruned partitions, ADC
    // shortlist inside them, exact rerank from the same posting rows
    "ann_ivfpq_topk" -> (Similarity.ivfPqTopK _),
    // classical IVFADC: codes quantize the RESIDUAL v - c(v), so the
    // same 32-bit budget resolves finer distances inside each cluster
    "ann_ivfpq_residual" -> (Similarity.ivfPqResidualTopK _),
    // scalar quantization (SQ8): 4x-compressed codes, per-dim min/max
    // "codebook", decode-on-the-fly ADC scan
    "ann_sq_topk" -> (ScalarQuant.sqTopK _),
    // SQ shortlist + exact rerank from stored vectors
    "ann_sq_rerank" -> (ScalarQuant.sqRerank _),
    "ann_lsh_multiprobe" -> (Similarity.lshMultiProbeTopK _),
    "ann_lsh_multitable" -> (Similarity.lshMultiTableTopK _),
    "embedding_near_dup" -> ((s: SparkSession, d: String) => Similarity.embeddingNearDup(s, d)),
    // diversity-aware retrieval: greedy MMR over a distributed
    // shortlist + pairwise-sim table, exact-decimal selection
    "mmr_rerank" -> ((s: SparkSession, d: String) => Similarity.mmrTopK(s, d)),
    // D4-style diversity subset: up to 10 vectors from EVERY trained
    // IVF cluster, deterministic md5 within-cluster order
    "cluster_balanced_sample" -> ((s: SparkSession, d: String) =>
      Similarity.clusterBalancedSample(s, d)),
    // semi-supervised label propagation: the labeled 80% votes labels
    // onto the held-out 20% through sign-bucket KNN neighborhoods
    "knn_label_propagation" -> ((s: SparkSession, d: String) =>
      Similarity.knnLabelPropagation(s, d)),
    // corpus-health duplication panel: distinct 3-grams bucketed by
    // document frequency (the dedup-threshold tuning signal)
    "ngram_dup_profile" -> ((s: SparkSession, d: String) =>
      TextDedup.ngramDuplicationProfile(s, d)),
    // per-doc share of corpus-unique 3-grams (extraction-risk screen)
    "memorization_risk" -> ((s: SparkSession, d: String) =>
      TextDedup.memorizationRisk(s, d)),
    "semantic_clusters" -> ((s: SparkSession, d: String) => TextDedup.semanticClusters(s, d)),
    "label_centroids" -> (Similarity.labelCentroids _),
    // 3-sigma below-cohesion outliers per label (vector quality gate)
    "embedding_outliers" -> ((s: SparkSession, d: String) =>
      Similarity.embeddingOutliers(s, d)),
    // -- text analysis --
    "text_lang_stats" -> (TextAnalysis.langStats _),
    "text_quality" -> (TextAnalysis.qualityScore _),
    "text_repetition" -> (TextAnalysis.repetition _),
    "text_redact" -> (TextAnalysis.redact _),
    "text_lang_id" -> (TextAnalysis.langId _),
    "text_token_counts" -> (TextAnalysis.tokenCounts _),
    "text_fingerprints" -> (TextAnalysis.fingerprints _),
    // mergeable-sketch cardinality: HLL distinct-3-gram estimate per
    // source next to the exact count it approximates
    "hll_gram_cardinality" -> ((s: SparkSession, d: String) =>
      TextAnalysis.hllGramCardinality(s, d)),
    // count-min sketch estimates beside exact counts for the top-20
    // words (the frequency twin of the HLL panel)
    "cms_heavy_hitters" -> ((s: SparkSession, d: String) =>
      TextAnalysis.cmsHeavyHitters(s, d)),
    // padding-waste accounting for sequence bucketing: power-of-two
    // word-length buckets with per-bucket waste share
    "length_buckets" -> (TextAnalysis.lengthBuckets _),
    // charset health per source: non-ASCII share, control chars,
    // U+FFFD replacement chars (the double-decode fingerprint)
    "charset_stats" -> (TextAnalysis.charsetStats _),
    // DoReMi-lite: difficulty-proportional domain mixture weights +
    // integer quotas for a 1000-doc budget
    "domain_reweight" -> ((s: SparkSession, d: String) =>
      TextAnalysis.domainReweight(s, d)),
    // distribution-shift monitor: symmetric smoothed KL between the
    // token distributions of the two corpus halves, per source
    "corpus_drift" -> (TextAnalysis.corpusDrift _),
    // WHERE the corpus shifted: KL(decile || corpus) per arrival slice
    "corpus_drift_deciles" -> (TextAnalysis.corpusDriftDeciles _),
    // tokenizer fertility: BPE tokens per word by source (vocab-eval
    // panel; rides the session-cached tokenizer)
    "bpe_fertility" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpeFertility(s, d)),
    // curriculum layout: z-score difficulty phases (no global window)
    // + md5 shards within phase
    "curriculum_assign" -> ((s: SparkSession, d: String) =>
      TextAnalysis.curriculumAssign(s, d)),
    // vocabulary-diversity panel: per-source Shannon token entropy +
    // top-token share (boilerplate detector)
    "token_entropy" -> (TextAnalysis.tokenEntropy _),
    // top-3 tf-idf keywords per sampled doc (corpus df over the FULL
    // corpus; portable-rounded idf feeds the ordering)
    "tfidf_keywords" -> ((s: SparkSession, d: String) =>
      TextAnalysis.tfidfKeywords(s, d)),
    // top-20 PMI collocations (pair count >= 5) — phrase mining
    "pmi_collocations" -> ((s: SparkSession, d: String) =>
      TextAnalysis.pmiCollocations(s, d)),
    // distinct-1/2/3 per source — corpus-level diversity panel
    "distinct_ngram_diversity" -> ((s: SparkSession, d: String) =>
      TextAnalysis.distinctNgramDiversity(s, d)),
    // rendezvous sharding: per-shard movement audit for a 16 -> 17
    // rescale (minimal-movement property; moved docs only go NEW)
    "rendezvous_shards" -> ((s: SparkSession, d: String) =>
      Mixing.rendezvousShards(s, d)),
    // banded perceptual-hash near-dup over the media column
    "media_phash_dedup" -> ((s: SparkSession, d: String) =>
      Multimodal.phashNearDup(s, d)),
    // the WIDE (240-bit, 30-bit bands) scale face of the same candidate
    // discipline — the fixed-selectivity fix measured at sf100
    "media_phash_dedup_wide" -> ((s: SparkSession, d: String) =>
      Multimodal.phashNearDupWide(s, d)),
    // the wide face over the MIXED population: every 100th doc is a
    // REAL encoded PNG (shared md5-60 pixel formula, identical-pixel
    // triplets) — the real decode arm at corpus-proportional mass
    "media_phash_dedup_mixed" -> ((s: SparkSession, d: String) =>
      Multimodal.phashNearDupMixed(s, d)),
    "stratified_sample" -> (TextAnalysis.stratifiedSample _),
    "token_histogram" -> (TextAnalysis.tokenHistogram _),
    // self-trained unigram-LM surprisal (the CCNet perplexity filter
    // without the external KenLM artifact)
    "text_perplexity" -> (TextAnalysis.unigramSurprisal _),
    // the per-source dataset-card panel: counts, lang mix, near-dup
    // exposure, contamination, mean quality — one composed plan over
    // the shared session caches
    "dataset_card" -> (TextAnalysis.datasetCard _),
    // the published Gopher rule gate: named per-rule 0/1 outcomes + the
    // conjunction (which rule kills a doc is the actionable signal)
    "quality_rules" -> (TextAnalysis.qualityRules _),
    // the full CCNet-style signal: Jelinek-Mercer interpolated bigram LM
    // (0.75 * MLE bigram + 0.25 * add-one unigram, first token unigram)
    "text_perplexity_bigram" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bigramSurprisal(s, d)),
    // context-window chunking (64-word chunks, 8-word overlap)
    "chunk_documents" -> ((s: SparkSession, d: String) =>
      TextAnalysis.chunkDocuments(s, d)),
    // the first BPE merge table (corpus-weighted char-pair counts)
    "bpe_top_pairs" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpeTopPairs(s, d)),
    // iterative trainer: merge k's candidates only exist because merge
    // k-1 rewrote the vocab; checksum pins every round's rewrite
    "bpe_merges" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpeMerges(s, d)),
    "token_counts_bpe" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpeTokenCounts(s, d)),
    // full tokenizer encode: the trained merge table applied to real
    // documents, (doc_id, pos, token) streams — the artifact a training
    // job consumes
    "bpe_encode" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpeEncode(s, d)),
    // -- dataset mixing --
    "temperature_mix" -> (Mixing.temperatureMixStats _),
    // the upsampling half: uncapped tempered rates, floor + Bernoulli
    // copies, epoch column
    "epoch_repeat" -> (Mixing.epochRepeatStats _),
    "quota_sample" -> (Mixing.quotaSampleStats _),
    "weighted_sample" -> (Mixing.weightedSampleTopK _),
    // the threshold (large-k) plan, oracle-pinned at small k — must
    // select the identical rows
    "weighted_sample_threshold" -> (Mixing.weightedSampleThresholdFace _),
    // DSIR-style hashed-ngram importance selection (deterministic top-k
    // face of the importance-resampling draw)
    "importance_sample" -> ((s: SparkSession, d: String) =>
      Importance.importanceTopK(s, d)),
    // in-engine trained quality filter: 3 full-batch GD rounds on the
    // hashed-feature logistic model, margins as scores
    "quality_classifier" -> ((s: SparkSession, d: String) =>
      QualityClassifier.classifierScores(s, d)),
    "pack_shards" -> (Mixing.packShardsManifest _),
    "pack_shards_bpe" -> (Mixing.packShardsBpeManifest _),
    // seeded deterministic global shuffle into training shards:
    // hash-assigned shard + per-shard key order, both pinned per shard
    // (membership counts, rank-1 doc, order checksum)
    "shuffle_shards" -> ((s: SparkSession, d: String) =>
      Mixing.shuffleShards(s, d)),
    "cross_modal" -> (TextAnalysis.crossModal _),
    // -- keyword & hybrid retrieval --
    // BM25 over the session-cached inverted index; probe = term filter
    "bm25_topk" -> ((s: SparkSession, d: String) =>
      TextRanking.bm25TopK(s, d, Bm25QueryTerms, 10)),
    // "more like this doc": each query doc's top-tf terms as the query
    "bm25_multi" -> ((s: SparkSession, d: String) =>
      TextRanking.bm25TopKFor(s, d, Seq(0L, 1L, 2L), 5).orderBy("qid", "bm_rank")),
    // reciprocal-rank fusion of the BM25 and exact-cosine rank lists
    "hybrid_rrf" -> ((s: SparkSession, d: String) =>
      TextRanking.hybridRrfTopK(s, d, Seq(0L, 1L, 2L), 10)),
    // serving-side composition: hybrid top-5 packed into a 256-word
    // context budget in fused-rank order
    "rag_context" -> ((s: SparkSession, d: String) =>
      TextRanking.ragContext(s, d)),
    // same fusion with the vector leg routed through the composed
    // IVF+PQ probe instead of the exact scan — the 100 TB shape (both
    // legs pruned probes); kEach=5/nprobe=2/shortlist=20 reuse the
    // proven ann_ivfpq_topk lever settings
    "hybrid_rrf_ann" -> ((s: SparkSession, d: String) =>
      TextRanking.hybridRrfTopK(s, d, Seq(0L, 1L, 2L), 10, kEach = 5,
        method = "ivfpq", shortlist = 20)),
    // base build + 2 appends + compaction + crash retry == full rebuild:
    // the oracle scores the whole corpus directly, so hash equality is an
    // engine-independent proof of the append algebra
    "bm25_incremental" -> ((s: SparkSession, d: String) =>
      TextRanking.incrementalBm25Replay(s, d, Bm25QueryTerms, 10)),
    // -- multimodal plumbing --
    "multimodal_meta" -> (Multimodal.extractFeatures _),
    "multimodal_format_stats" -> (Multimodal.formatStats _),
    "multimodal_frames" -> (Multimodal.frameSample _),
    "multimodal_resize" -> (Multimodal.resizePlan _),
    // -- composed curation pipeline --
    "pipeline_filtered_docs" -> (CurationPipeline.filteredCorpus _),
    // the composed batch pipeline end-to-end: keep-best dedup ->
    // quality gate -> holdout + exact decontamination -> chunking
    "pipeline_training_manifest" -> (CurationPipeline.trainingManifest _),
    // the composed training layout: manifest survivors banded into
    // z-score curriculum phases (survivor-only statistics) + md5 shards
    "pipeline_curriculum_manifest" -> ((s: SparkSession, d: String) =>
      CurationPipeline.curriculumManifest(s, d)),
    // the streaming gates under the oracle: 3 sequential micro-batches
    // through processBatch with REAL persisted fp/band/sig indexes
    "curation_replay" -> (CurationPipeline.curationReplay _),
    // same replay with the benchmark gate on the chunk sink:
    // contaminated docs are curated yet never chunk
    "curation_replay_decontam" -> (CurationPipeline.curationReplayDecontam _),
    "vector_curation_replay" -> (CurationPipeline.vectorCurationReplay _),
    // the MEDIA gate under the oracle: 3 sequential micro-batches of
    // (corpus stand-ins + planted decodable PNGs) through
    // processMediaBatch with a real persisted band index
    "media_curation_replay" -> ((s: SparkSession, d: String) =>
      CurationPipeline.mediaCurationReplay(s, d)),
    // the media gate replay over the MIXED population (1% real images):
    // measures the gate's decode-once + wide-band candidate cost under
    // a realistic image fraction, oracle-checked like the stub replay
    "media_curation_replay_mixed" -> ((s: SparkSession, d: String) =>
      CurationPipeline.mediaCurationReplayMixed(s, d))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL. Shared fragments:

  /** Lower-cased whitespace words of `text` (mirrors TextHashing.words). */
  private val WordsSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  /** Word 3-gram shingles (mirrors TextHashing.shingles). */
  private val ShinglesCte =
    s"""wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
       |shl AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
       |  ELSE list_transform(generate_series(1, len(ws)-2), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS sharr FROM wrd),
       |sh AS (SELECT DISTINCT doc_id, unnest(sharr) AS sh FROM shl)""".stripMargin

  /** SQ8 train/encode/decode CTEs (mirrors ScalarQuant digit for digit):
    * per-dim [min, max] (order-free aggregates), 8-bit codes
    * floor((v-mn)*255/(mx-mn) + 0.5) clamped to 255, reconstruction
    * v̂ = mn + code*(mx-mn)/255. Assumes a CTE `e(vec_id, v)`. */
  private val SqCtes = {
    val mnArr = "[" + (1 to 64).map(i => s"min(v[$i])").mkString(", ") + "]"
    val mxArr = "[" + (1 to 64).map(i => s"max(v[$i])").mkString(", ") + "]"
    s"""mm AS (SELECT $mnArr AS mn, $mxArr AS mx FROM e),
       |cd AS (SELECT vec_id, list_transform(generate_series(1, 64), i ->
       |  CASE WHEN mx[i] = mn[i] THEN 0.0
       |       ELSE least(255.0, floor((v[i] - mn[i]) * 255.0 / (mx[i] - mn[i]) + 0.5)) END) AS cs
       |  FROM e CROSS JOIN mm),
       |dec AS (SELECT vec_id, list_transform(generate_series(1, 64), i ->
       |  mn[i] + (cs[i] * (mx[i] - mn[i])) / 255.0) AS vhat
       |  FROM cd CROSS JOIN mm)""".stripMargin
  }

  /** The fixed keyword query for bm25_topk (terms of varying df). */
  private val Bm25QueryTerms = Seq("spark", "merge", "window")

  /** BM25 corpus relations (mirrors TextRanking.postings / dfTable /
    * corpusStats): inverted-index postings, per-doc length, lexicon, and
    * the two corpus scalars. */
  private val Bm25Cte =
    s"""wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
       |dlen AS (SELECT doc_id, len(ws) AS dl FROM wrd),
       |post AS (SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(ws) AS term FROM wrd) GROUP BY 1, 2),
       |lex AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
       |stats AS (SELECT count(*) AS n, CAST(sum(len(ws)) AS DOUBLE)/count(*) AS avgdl FROM wrd)""".stripMargin

  /** The per-(doc, term) BM25 contribution (mirrors
    * TextRanking.contribution term for term, k1=1.2 b=0.75 spelled as the
    * same double arithmetic): rounded to 6 then DECIMAL(18,6) so the score
    * sum is exact and addition-order-free. Expects tf, dl, df, n, avgdl
    * resolvable in scope. */
  private val Bm25W =
    "CAST(round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * " +
      "((tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))), 6) AS DECIMAL(18,6))"

  /** "More like this doc" query terms + the scored-candidates CTE chain
    * shared by bm25_multi and hybrid_rrf: each query doc's 3 highest-tf
    * terms (term-asc tie-break), candidates scored with the query doc
    * excluded, ranked per qid. */
  private val Bm25MultiCtes =
    s"""qt AS (SELECT doc_id AS qid, term FROM (
       |  SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS trn
       |  FROM post WHERE doc_id IN (0, 1, 2)) WHERE trn <= 3),
       |wv AS (SELECT qt.qid, p.doc_id, $Bm25W AS w
       |  FROM post p JOIN qt ON qt.term = p.term AND p.doc_id <> qt.qid
       |  JOIN lex ON lex.term = p.term
       |  JOIN dlen dd ON dd.doc_id = p.doc_id CROSS JOIN stats),
       |sbm AS (SELECT qid, doc_id, CAST(sum(w) AS DOUBLE) AS score FROM wv GROUP BY qid, doc_id),
       |br AS (SELECT qid, doc_id, score,
       |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS bm_rank FROM sbm)""".stripMargin

  /** Recursive transitive closure + singleton completion over a
    * doc-level pair relation `rel(doc_a, doc_b)` — the shared tail of
    * the ngram/minhash cluster oracles (the simhash variant closes over
    * sig nodes instead and keeps its own form). Requires WITH RECURSIVE
    * on the enclosing query. */
  private def docComponentsCtes(rel: String): String =
    s"""edges AS (SELECT doc_a AS sa, doc_b AS sb FROM $rel UNION ALL SELECT doc_b AS sa, doc_a AS sb FROM $rel),
       |pn AS (SELECT DISTINCT sa AS id FROM edges),
       |reach(src, dst) AS (SELECT id, id FROM pn
       |  UNION SELECT r.src, e.sb FROM reach r JOIN edges e ON r.dst = e.sa),
       |comp AS (SELECT src AS doc_id, min(dst) AS comp FROM reach GROUP BY src),
       |allc AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
       |  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN comp c USING (doc_id)),
       |rep AS (SELECT comp, min(doc_id) AS cluster_rep, count(*) AS cluster_size
       |  FROM allc GROUP BY comp)""".stripMargin

  private def docComponentsSql(rel: String): String =
    s"""${docComponentsCtes(rel)}
       |SELECT doc_id, cluster_rep, cluster_size FROM allc JOIN rep USING (comp)
       |ORDER BY doc_id""".stripMargin

  /** Shared banded-MinHash verified-pair CTE chain (preamble of the
    * minhash cluster oracles): jac + signature bands + candidates +
    * verified pairs as `mhp`. Requires WITH RECURSIVE + $JaccardCte. */
  private val MinhashPairsCtes: String =
    s"""hsh AS (SELECT doc_id, ${md5LongSql("sh")} % 2147483647 AS hm FROM sh),
       |mh AS (SELECT doc_id, i, min(((2*i+1)*hm + i*i+7) % 2147483647) AS mh
       |  FROM hsh CROSS JOIN (SELECT unnest(generate_series(0,31)) AS i) GROUP BY 1, 2),
       |bt AS (SELECT doc_id, i//4 AS band, string_agg(concat(i%4, ':', mh), ',' ORDER BY i%4) AS band_key
       |  FROM mh GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bt a
       |  JOIN bt b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |mhp AS (SELECT j.doc_a, j.doc_b FROM jac j JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b)""".stripMargin

  /** 60-bit md5 integer hash of an expression (mirrors TextHashing.md5Long). */
  private def md5LongSql(e: String) =
    s"CAST(concat('0x', substr(md5($e),1,15)) AS BIGINT)"

  /** 240-bit hamming between two 4-limb prefixes — every bit_count cast
    * before the addition (DuckDB bit_count returns TINYINT, max 127;
    * four limbs sum to 240). */
  private def wideHamSql(a: String, b: String): String =
    (0 to 3).map(k => s"CAST(bit_count(xor($a$k, $b$k)) AS INT)").mkString(" + ")

  /** The four CASE-summed limb columns of a (doc_id, cell, v) frame vs
    * its per-doc 256-cell mean — limb k covers cells [60k, 60k+60). */
  private def wideLimbSumsSql(cells: String, means: String): String =
    (0 to 3).map { k =>
      val lo = k * 60
      s"CAST(sum(CASE WHEN $cells.cell >= $lo AND $cells.cell < ${lo + 60} " +
        s"AND CAST($cells.v AS DOUBLE) > $means.mean " +
        s"THEN (CAST(1 AS BIGINT) << ($cells.cell - $lo)) ELSE 0 END) AS BIGINT) AS h$k"
    }.mkString(", ")

  /** CTE chain of the MIXED wide-hash population (mirrors
    * Multimodal.phash240MixedFrame): planted 16x16 aHashes from the
    * shared pixel formula, every `den`-th corpus doc as a REAL image
    * whose pixels derive from md5-60('mix:' || doc_id//(3*den) || ':' ||
    * pix) — identical-pixel triplets — and digest-once limb stubs for
    * the rest. Ends in ph(doc_id, h0..h3). */
  private def mixedWidePhCtes(den: Int = 100): String = {
    val grp = 3 * den
    s"""pg AS (SELECT g.g, p.pix,
       |    ${md5LongSql("concat('img:', CAST(g.g AS VARCHAR), ':', CAST(p.pix AS VARCHAR))")} % 256 AS v0
       |  FROM (SELECT unnest(generate_series(0, 3)) AS g) g
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pix) p),
       |pv2 AS (SELECT -1000000000 + c.g * 3 + j.j AS doc_id, c.cell,
       |    CASE WHEN j.j = 1 AND c.pix = 0 THEN (c.v0 + 64) % 256 ELSE c.v0 END AS v
       |  FROM (SELECT pg.g, pg.v0, pg.pix, cc.cell
       |    FROM (SELECT unnest(generate_series(0, 255)) AS cell) cc
       |    JOIN pg ON pg.pix = ((cc.cell // 16) // 2) * 8 + ((cc.cell % 16) // 2)) c
       |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) j),
       |pm2 AS (SELECT doc_id, CAST(sum(v) AS DOUBLE) / 256.0 AS mean FROM pv2 GROUP BY 1),
       |pp2 AS (SELECT pv2.doc_id, ${wideLimbSumsSql("pv2", "pm2")}
       |  FROM pv2 JOIN pm2 USING (doc_id) GROUP BY 1),
       |mxp AS (SELECT g.grp, p.pix,
       |    ${md5LongSql("concat('mix:', CAST(g.grp AS VARCHAR), ':', CAST(p.pix AS VARCHAR))")} % 256 AS v
       |  FROM (SELECT DISTINCT doc_id // $grp AS grp FROM documents WHERE doc_id % $den = 0) g
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pix) p),
       |mxc AS (SELECT d.doc_id, cc.cell, mp.v
       |  FROM (SELECT doc_id, doc_id // $grp AS grp FROM documents WHERE doc_id % $den = 0) d
       |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS cell) cc
       |  JOIN mxp mp ON mp.grp = d.grp
       |    AND mp.pix = ((cc.cell // 16) // 2) * 8 + ((cc.cell % 16) // 2)),
       |mxm AS (SELECT doc_id, CAST(sum(v) AS DOUBLE) / 256.0 AS mean FROM mxc GROUP BY 1),
       |mxh AS (SELECT mxc.doc_id, ${wideLimbSumsSql("mxc", "mxm")}
       |  FROM mxc JOIN mxm USING (doc_id) GROUP BY 1),
       |ph AS (SELECT doc_id,
       |    ${md5LongSql("concat(md5(text), ':0')")} AS h0, ${md5LongSql("concat(md5(text), ':1')")} AS h1,
       |    ${md5LongSql("concat(md5(text), ':2')")} AS h2, ${md5LongSql("concat(md5(text), ':3')")} AS h3
       |  FROM documents WHERE doc_id % $den <> 0
       |  UNION ALL SELECT doc_id, h0, h1, h2, h3 FROM mxh
       |  UNION ALL SELECT doc_id, h0, h1, h2, h3 FROM pp2)""".stripMargin
  }

  /** The unrolled iterative-BPE training chain (mirrors
    * TextAnalysis.bpeTrainMerges round for round): wrd/wv/vz0 build the
    * word vocabulary with single-character symbols; round r emits p{r}
    * (corpus-weighted pair counts), m{r} (the merge chosen by n desc /
    * pair asc), v{r} (a recursive-CTE pointer-walk greedy rewrite —
    * algorithm-independent of the Spark side's array fold) and vz{r}
    * (the rewritten vocab). MATERIALIZED wherever a CTE is referenced
    * twice: DuckDB inlines CTEs by default and the round chain would
    * otherwise expand to 2^N corpus scans. Exposes `mg`
    * (merge_rank, pair, n) and `chk` (order-free final-vocab checksum:
    * sum of md5Long(word ':' syms-joined-'|') mod P). */
  /** Unrolled full-batch GD rounds for the trained quality classifier
    * (mirrors QualityClassifier.classifierScores round for round):
    * fr = distinct hashed presence features, nn = doc count, yy = labels,
    * then per round r: e{r} (rounded residuals), g{r} (exact decimal
    * gradient sums), w{r} (grid-rounded weights); fz = final margins.
    * Every bucket in fr appears in every g{r}/w{r} (each bucket has >= 1
    * doc and each doc has a residual), so inner joins chain losslessly. */
  private def qcTrainCtes(rounds: Int): String = {
    val head =
      s"""qw AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |qg AS (SELECT doc_id, list_concat(ws, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) END) AS fs FROM qw),
         |fr AS MATERIALIZED (SELECT DISTINCT doc_id, ${md5LongSql("concat('f:', f)")} % 4096 AS b FROM (SELECT doc_id, unnest(fs) AS f FROM qg)),
         |nn AS (SELECT count(DISTINCT doc_id) AS n FROM fr),
         |yy AS (SELECT DISTINCT doc_id, CASE WHEN doc_id % 7 = 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y FROM fr)""".stripMargin
    val body = (1 to rounds).map { r =>
      val sig = if (r == 1) "CAST(0.0 AS DOUBLE)" else s"CAST(z$r.z AS DOUBLE)"
      val zCte = if (r == 1) ""
        else s"""z$r AS (SELECT doc_id, sum(w) AS z FROM fr JOIN w${r - 1} USING (b) GROUP BY doc_id),
                |""".stripMargin
      val eFrom = if (r == 1) "yy" else s"z$r JOIN yy USING (doc_id)"
      val prevW = if (r == 1) "CAST(0.0 AS DOUBLE)" else s"CAST(w${r - 1}.w AS DOUBLE)"
      val wFrom = if (r == 1) s"g$r CROSS JOIN nn"
        else s"w${r - 1} JOIN g$r USING (b) CROSS JOIN nn"
      s"""${zCte}e$r AS (SELECT doc_id, CAST(round(y - CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-$sig)), 6) AS DECIMAL(18,6)) AS err FROM $eFrom),
         |g$r AS (SELECT b, sum(err) AS g FROM fr JOIN e$r USING (doc_id) GROUP BY b),
         |w$r AS MATERIALIZED (SELECT b, CAST(round($prevW + 0.5 * CAST(g AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS w FROM $wFrom)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$body,
       |fz AS (SELECT doc_id, sum(w) AS z FROM fr JOIN w$rounds USING (b) GROUP BY doc_id)""".stripMargin
  }

  private def bpeTrainCtes(numMerges: Int): String = {
    val head =
      s"""wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |wv AS (SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM (SELECT unnest(ws) AS word FROM wrd) GROUP BY word),
         |vz0 AS MATERIALIZED (SELECT word, wcnt, list_transform(range(1, length(word)+1), i -> word[i]) AS syms FROM wv)""".stripMargin
    val rounds = (1 to numMerges).map { r =>
      val z = r - 1
      s"""p$r AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS rr, CAST(sum(wcnt) AS BIGINT) AS n
         |  FROM vz$z, unnest(range(1, len(syms))) AS t(i) GROUP BY 1, 2),
         |m$r AS (SELECT l, rr, n FROM p$r ORDER BY n DESC, l || ' ' || rr LIMIT 1),
         |v$r AS (
         |  SELECT word, wcnt, syms, CAST(1 AS BIGINT) AS pos, CAST([] AS VARCHAR[]) AS acc FROM vz$z
         |  UNION ALL
         |  SELECT word, wcnt, syms,
         |    CASE WHEN pos < len(syms) AND syms[pos] = (SELECT l FROM m$r) AND syms[pos+1] = (SELECT rr FROM m$r) THEN pos + 2 ELSE pos + 1 END,
         |    list_append(acc, CASE WHEN pos < len(syms) AND syms[pos] = (SELECT l FROM m$r) AND syms[pos+1] = (SELECT rr FROM m$r) THEN (SELECT l FROM m$r) || (SELECT rr FROM m$r) ELSE syms[pos] END)
         |  FROM v$r WHERE pos <= len(syms)),
         |vz$r AS MATERIALIZED (SELECT word, wcnt, acc AS syms FROM v$r WHERE pos = len(syms) + 1)""".stripMargin
    }
    val mg = (1 to numMerges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, l || ' ' || rr AS pair, n FROM m$r").mkString(" UNION ALL ")
    val chk =
      s"""chk AS (SELECT CAST(sum(${md5LongSql("word || ':' || array_to_string(syms, '|')")} % 2147483647) AS BIGINT) AS c FROM vz$numMerges)"""
    (Seq(head) ++ rounds ++ Seq(s"mg AS ($mg)", chk)).mkString(",\n")
  }

  /** Exact pairwise Jaccard >= `threshold` over shared shingles (mirrors
    * TextHashing.jaccardPairs / the ngramClustersAt sweep knob). */
  private def jaccardCteAt(threshold: Double) =
    s"""$ShinglesCte,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |jac AS (SELECT doc_a, doc_b, round(CAST(ni AS DOUBLE)/(sa.n + sb.n - ni), 6) AS jaccard
       |  FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(ni AS DOUBLE)/(sa.n + sb.n - ni) >= $threshold)""".stripMargin

  private val JaccardCte = jaccardCteAt(0.2)

  /** Embeddings cast to double with sign-pattern LSH bucket over dims 1-4
    * (mirrors Similarity.bucket). */
  private val EmbBucketCte =
    """emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |bkt AS (SELECT vec_id, label, v,
      |  (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END + CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END
      |   + CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END + CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bkt FROM emb)""".stripMargin

  /** AUTO-SIZED sign-bucket CTE (mirrors Similarity.autoNBits +
    * Similarity.bucket): nbits = max(4, ceil(log2(n / 125))) from the
    * corpus count, so bucket population stays ~constant per decade.
    * LOG2 is exact at power-of-two ratios — the only points where a
    * ceil could disagree with the Scala integer-doubling formula.
    * Used by the near-dup pair families; the ANN LSH probes keep the
    * fixed 4-bit [[EmbBucketCte]] (query recall, not pair gating). */
  private val EmbAutoBucketCte =
    """nb AS (SELECT GREATEST(4, CAST(CEIL(LOG2(CAST(count(*) AS DOUBLE) / 125.0)) AS INTEGER)) AS nbits FROM embeddings),
      |emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |bkt AS (SELECT vec_id, label, v,
      |  CAST(list_sum(list_transform(range(1, (SELECT nbits FROM nb) + 1),
      |    i -> CASE WHEN v[i] >= 0 THEN CAST(1 AS BIGINT) << (i-1) ELSE 0 END)) AS BIGINT) AS bkt FROM emb)""".stripMargin

  /** Simhash block-combination banding, SQL side (mirrors
    * TextDedup.simhashLevel + simhashBandSpecs — the band-spec VALUES
    * rows are GENERATED from the Scala spec function, so the two sides
    * cannot drift). Emits `nlvl(lvl)` (population-driven level over a
    * previously defined `sigs(…, sig)` CTE — integer thresholds, no
    * LOG2, so an empty corpus picks level 0 instead of erroring) and
    * `bspec(lvl, b, s0, w0, s1, w1, s2, w2)` (three uniform
    * shift/width limbs; unused limbs have width 0 and a zero mask).
    * The caller joins `bspec` at `(SELECT lvl FROM nlvl)` — or at a
    * literal level for the forced-level gate queries. */
  private def simhashBandSpecSqlRows: String =
    (0 to 2).flatMap { lvl =>
      graft.ops.TextDedup.simhashBandSpecs(lvl).zipWithIndex.map { case (limbs, b) =>
        val cells = limbs.padTo(3, (0, 0))
          .map { case (sh, bits) => s"$sh, $bits" }.mkString(", ")
        s"($lvl, $b, $cells)"
      }
    }.mkString(",\n|  ")

  private val SimhashLvlCte =
    s"""nlvl AS (SELECT CASE
       |  WHEN count(DISTINCT sig) <= ${graft.ops.TextDedup.SimHashTargetPop << 12} THEN 0
       |  WHEN count(DISTINCT sig) <= ${graft.ops.TextDedup.SimHashTargetPop << 16} THEN 1
       |  ELSE 2 END AS lvl FROM sigs),
       |bspec(lvl, b, s0, w0, s1, w1, s2, w2) AS (VALUES $simhashBandSpecSqlRows)""".stripMargin

  /** Band key of one bspec row over a signature column: the three
    * limbs extracted shift/mask and packed LSB-first (width-0 limbs
    * mask to 0). Identical algebra to TextDedup.simhashBandValCol. */
  private def simhashBandValSql(sig: String): String =
    // single line: the enclosing oracle strings are stripMargin'd, and
    // a leading SQL bitwise-OR would read as a margin marker
    s"(($sig >> s0) & ((CAST(1 AS BIGINT) << w0) - 1)) | " +
      s"((($sig >> s1) & ((CAST(1 AS BIGINT) << w1) - 1)) << w0) | " +
      s"((($sig >> s2) & ((CAST(1 AS BIGINT) << w2) - 1)) << (w0 + w1))"

  /** The all-pairs simhash oracle at a banding level (`lvlSql` is the
    * population-driven `(SELECT lvl FROM nlvl)` for the production
    * face, or a literal for the forced-level gate queries — mirrors
    * TextDedup.simhashAt). */
  private def simhashPairsOracleSql(lvlSql: String): String =
    s"""WITH dw AS (SELECT DISTINCT doc_id, w FROM
       |  (SELECT doc_id, unnest($WordsSql) AS w FROM documents)),
       |wh AS (SELECT doc_id, ${md5LongSql("w")} AS wh FROM dw),
       |votes AS (SELECT doc_id, j, sum(CASE WHEN (wh >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM wh CROSS JOIN (SELECT unnest(generate_series(0,47)) AS j) GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS sig
       |  FROM votes GROUP BY 1),
       |$SimhashLvlCte,
       |bands AS (SELECT doc_id, sig, b, ${simhashBandValSql("sig")} AS band_val
       |  FROM sigs CROSS JOIN bspec WHERE bspec.lvl = $lvlSql),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, x.sig AS sig_a, y.doc_id AS doc_b, y.sig AS sig_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= ${graft.ops.TextDedup.SimHashHammingMax} ORDER BY doc_a, doc_b""".stripMargin

  /** The cluster-contract simhash oracle at a banding level —
    * connected components via recursive transitive closure, an
    * algorithm independent of the Spark side's label propagation.
    * Mirrors TextDedup.simhashClusters / simhashClustersAt. */
  private def simhashClustersOracleSql(lvlSql: String): String =
    s"""WITH RECURSIVE dw AS (SELECT DISTINCT doc_id, w FROM
       |  (SELECT doc_id, unnest($WordsSql) AS w FROM documents)),
       |wh AS (SELECT doc_id, ${md5LongSql("w")} AS wh FROM dw),
       |votes AS (SELECT doc_id, j, sum(CASE WHEN (wh >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM wh CROSS JOIN (SELECT unnest(generate_series(0,47)) AS j) GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS sig
       |  FROM votes GROUP BY 1),
       |usig AS (SELECT DISTINCT sig FROM sigs),
       |$SimhashLvlCte,
       |bands AS (SELECT sig, b, ${simhashBandValSql("sig")} AS band_val
       |  FROM usig CROSS JOIN bspec WHERE bspec.lvl = $lvlSql),
       |ep AS (SELECT DISTINCT x.sig AS sa, y.sig AS sb
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.band_val = y.band_val AND x.sig < y.sig
       |  WHERE bit_count(xor(x.sig, y.sig)) <= ${graft.ops.TextDedup.SimHashHammingMax}),
       |edges AS (SELECT sa, sb FROM ep UNION ALL SELECT sb AS sa, sa AS sb FROM ep),
       |reach(src, dst) AS (SELECT sig, sig FROM usig
       |  UNION SELECT r.src, e.sb FROM reach r JOIN edges e ON r.dst = e.sa),
       |comp AS (SELECT src AS sig, min(dst) AS comp FROM reach GROUP BY src),
       |dc AS (SELECT doc_id, comp FROM sigs JOIN comp USING (sig)),
       |rep AS (SELECT comp, min(doc_id) AS cluster_rep, count(*) AS cluster_size
       |  FROM dc GROUP BY comp)
       |SELECT doc_id, cluster_rep, cluster_size FROM dc JOIN rep USING (comp)
       |ORDER BY doc_id""".stripMargin

  private val centroidCols: String =
    (0 until 64).map(i =>
      s"round(CAST(sum(CAST(v[${i + 1}] AS DECIMAL(27,12))) AS DOUBLE),3) AS s${"%02d".format(i)}").mkString(", ")

  /** The unrolled deterministic-k-means IVF training (mirrors
    * Similarity.kmeansTrain step for step): coarse centroids `c2` and
    * final assignment `af(vec_id, v, c_id)`. Assumes a CTE
    * `e(vec_id, v)` is already defined. */
  private def ivfTrainCtes: String = {
    val meanArr = "[" + (1 to 64).map(i =>
      s"CAST(sum(CAST(v[$i] AS DECIMAL(27,12))) AS DOUBLE)/count(*)").mkString(", ") + "]"
    def assign(src: String, cents: String, out: String) =
      s"""$out AS (SELECT vec_id, v, c_id FROM (
         |  SELECT b.vec_id, b.v, c.c_id, row_number() OVER (PARTITION BY b.vec_id
         |    ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC, c.c_id) AS rn
         |  FROM $src b CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    def update(asg: String, out: String) =
      s"$out AS (SELECT c_id, $meanArr AS cv FROM $asg GROUP BY c_id)"
    s"""bk AS (SELECT vec_id, v,
       |  (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END + CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END
       |   + CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END + CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bkt FROM e),
       |seedid AS (SELECT bkt AS c_id, min(vec_id) AS svid FROM bk GROUP BY bkt),
       |c0 AS (SELECT s.c_id, b.v AS cv FROM seedid s JOIN bk b ON b.vec_id = s.svid),
       |${assign("e", "c0", "a1")},
       |${update("a1", "c1")},
       |${assign("e", "c1", "a2")},
       |${update("a2", "c2")},
       |${assign("e", "c2", "af")}""".stripMargin
  }

  /** Probe planning shared by the IVF-family oracles: queries 0-2 rank
    * the trained centroids, `best` keeps each query's `nprobe` closest. */
  private def ivfProbeCtes(nprobe: Int): String =
    s"""q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0,1,2)),
       |pc AS (SELECT qid, qv, c_id, row_number() OVER (PARTITION BY qid
       |  ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC, c_id) AS crn FROM q CROSS JOIN c2),
       |best AS (SELECT qid, qv, c_id FROM pc WHERE crn <= $nprobe)""".stripMargin

  /** The full IVF oracle (mirrors Similarity.ivfTopK), parameterized by
    * how many best clusters the probe scans. */
  private def ivfOracleSql(nprobe: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$ivfTrainCtes,
       |${ivfProbeCtes(nprobe)},
       |s AS (SELECT qid, a.vec_id, round(list_cosine_similarity(qv, a.v), 6) AS cos_sim
       |  FROM best b JOIN af a ON a.c_id = b.c_id AND a.vec_id <> b.qid),
       |r AS (SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
       |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= 5 ORDER BY qid, cos_sim DESC, vec_id""".stripMargin

  /** Unrolled greedy-MMR oracle (mirrors Similarity.mmrTopK): step 1
    * takes the top-rel candidate; step i scores every remaining
    * candidate λ·rel − (1−λ)·max-sim-to-selected in EXACT decimal
    * (λ two places, similarities six → scores are exact 8-place
    * decimals in both engines, so the per-step argmax cannot drift). */
  private def mmrOracleSql(k: Int, shortlist: Int,
                           lamHundredths: Int = 70): String = {
    val lam = f"CAST(0.$lamHundredths%02d AS DECIMAL(3,2))"
    val oneMinus = f"CAST(0.${100 - lamHundredths}%02d AS DECIMAL(3,2))"
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0,1,2)),
       |sc AS (SELECT qid, e.vec_id, round(list_cosine_similarity(qv, e.v), 6) AS relr, e.v
       |  FROM e CROSS JOIN q WHERE e.vec_id <> qid),
       |sl AS (SELECT qid, vec_id, CAST(relr AS DECIMAL(18,6)) AS rel, v FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY relr DESC, vec_id) AS rn FROM sc) WHERE rn <= $shortlist),
       |ps AS (SELECT a.qid, a.vec_id AS va, b.vec_id AS vb,
       |  CAST(round(list_cosine_similarity(a.v, b.v), 6) AS DECIMAL(18,6)) AS sim
       |  FROM sl a JOIN sl b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
       |s1 AS (SELECT qid, vec_id, CAST(rel AS DECIMAL(22,8)) AS score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn FROM sl) WHERE rn = 1),
       |sel1 AS (SELECT qid, vec_id FROM s1)""".stripMargin
    for (i <- 2 to k) {
      sb ++= s""",
         |c$i AS (SELECT s.qid, s.vec_id, $lam * s.rel - $oneMinus * mx.m AS score
         |  FROM sl s JOIN (SELECT p.qid, p.va, max(p.sim) AS m FROM ps p
         |    JOIN sel${i - 1} t ON p.qid = t.qid AND p.vb = t.vec_id GROUP BY 1, 2) mx
         |  ON s.qid = mx.qid AND s.vec_id = mx.va
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x WHERE x.qid = s.qid AND x.vec_id = s.vec_id)),
         |s$i AS (SELECT qid, vec_id, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn FROM c$i) WHERE rn = 1),
         |sel$i AS (SELECT qid, vec_id FROM sel${i - 1} UNION ALL SELECT qid, vec_id FROM s$i)""".stripMargin
    }
    val unions = (1 to k)
      .map(i => s"SELECT qid, $i AS mmr_rank, vec_id, score FROM s$i")
      .mkString(" UNION ALL ")
    sb ++= s"\nSELECT qid, mmr_rank, vec_id, CAST(score AS DOUBLE) AS mmr_score FROM ($unions) ORDER BY qid, mmr_rank"
    sb.toString
  }

  private val PqMOracle = 8; private val PqDsubOracle = 8

  /** Product-quantization training CTEs: 8 independent 8-dim sub-k-means
    * (same deterministic recipe, squared-L2 assignment) ending in the
    * per-vector code relation `codes(vec_id, k0..k7)` and codebooks
    * `c{j}_2`. Assumes a CTE `e(vec_id, v)` is already defined. */
  private def pqTrainCtes: String = pqTrainCtesOver("e")

  /** Same training unroll over an arbitrary source relation
    * `src(vec_id, v)` — "e" for plain PQ, the residual relation for
    * IVFADC-style residual codes. */
  private def pqTrainCtesOver(src: String): String = {
    val M = PqMOracle; val dsub = PqDsubOracle
    def off(j: Int) = j * dsub
    def distSql(j: Int) = (1 to dsub).map(d =>
      s"(b.v[${off(j) + d}] - c.cv[$d])*(b.v[${off(j) + d}] - c.cv[$d])").mkString(" + ")
    def seedCtes(j: Int) = {
      val bkt = (0 until 4).map(i =>
        s"CASE WHEN v[${off(j) + i + 1}] >= 0 THEN ${1 << i} ELSE 0 END").mkString(" + ")
      val sub = (1 to dsub).map(d => s"b.v[${off(j) + d}]").mkString(", ")
      s"""sb$j AS (SELECT vec_id, v, ($bkt) AS bkt FROM $src),
         |sd$j AS (SELECT bkt AS c_id, min(vec_id) AS svid FROM sb$j GROUP BY bkt),
         |c${j}_0 AS (SELECT s.c_id, [$sub] AS cv FROM sd$j s JOIN sb$j b ON b.vec_id = s.svid)""".stripMargin
    }
    def assignCte(j: Int, r: Int) =
      s"""a${j}_$r AS (SELECT vec_id, v, c_id FROM (
         |  SELECT b.vec_id, b.v, c.c_id, row_number() OVER (PARTITION BY b.vec_id
         |    ORDER BY round(${distSql(j)}, 6) ASC, c.c_id) AS rn
         |  FROM $src b CROSS JOIN c${j}_${r - 1} c) WHERE rn = 1)""".stripMargin
    def updateCte(j: Int, r: Int) = {
      val means = (1 to dsub).map(d =>
        s"CAST(sum(CAST(v[${off(j) + d}] AS DECIMAL(27,12))) AS DOUBLE)/count(*)").mkString(", ")
      s"c${j}_$r AS (SELECT c_id, [$means] AS cv FROM a${j}_$r GROUP BY c_id)"
    }
    def finalAssign(j: Int) =
      s"""af$j AS (SELECT vec_id, c_id FROM (
         |  SELECT b.vec_id, c.c_id, row_number() OVER (PARTITION BY b.vec_id
         |    ORDER BY round(${distSql(j)}, 6) ASC, c.c_id) AS rn
         |  FROM $src b CROSS JOIN c${j}_2 c) WHERE rn = 1)""".stripMargin
    val per = (0 until M).map(j => Seq(seedCtes(j), assignCte(j, 1), updateCte(j, 1),
      assignCte(j, 2), updateCte(j, 2), finalAssign(j)).mkString(",\n")).mkString(",\n")
    val codeSel = (0 until M).map(j => s"af$j.c_id AS k$j").mkString(", ")
    val codeJoin = (0 until M).map(j => s"JOIN af$j ON af$j.vec_id = x.vec_id").mkString(" ")
    s"""$per,
       |codes AS (SELECT x.vec_id, $codeSel FROM $src x $codeJoin)""".stripMargin
  }

  /** ADC-score SQL fragments against a codes row aliased `k` and a query
    * row aliased `qa`: (codebook joins, approx_sim expression) — term
    * order mirrors Similarity's driver-side lookup tables exactly. */
  private def pqAdcSql(qa: String): (String, String) = {
    val M = PqMOracle; val dsub = PqDsubOracle
    def off(j: Int) = j * dsub
    val cbJoin = (0 until M).map(j => s"JOIN c${j}_2 cb$j ON cb$j.c_id = k.k$j").mkString(" ")
    val dotSum = (0 until M).map(j =>
      "(" + (1 to dsub).map(d => s"$qa.qv[${off(j) + d}]*cb$j.cv[$d]").mkString(" + ") + ")").mkString(" + ")
    val normSum = (0 until M).map(j =>
      "(" + (1 to dsub).map(d => s"cb$j.cv[$d]*cb$j.cv[$d]").mkString(" + ") + ")").mkString(" + ")
    val qnrm = (1 to 64).map(d => s"$qa.qv[$d]*$qa.qv[$d]").mkString(" + ")
    (cbJoin, s"round(($dotSum) / (sqrt($normSum) * sqrt($qnrm)), 6)")
  }

  /** The PQ-ADC oracle (mirrors Similarity.pqTopK): approximate
    * similarities straight from the codes. */
  private def pqOracleSql: String = {
    val (cbJoin, approx) = pqAdcSql("q")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$pqTrainCtes,
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0,1,2)),
       |s AS (SELECT q.qid, k.vec_id, $approx AS approx_sim
       |  FROM q CROSS JOIN codes k $cbJoin
       |  WHERE k.vec_id <> q.qid),
       |r AS (SELECT qid, vec_id, approx_sim, row_number() OVER (PARTITION BY qid ORDER BY approx_sim DESC, vec_id) AS rn FROM s)
       |SELECT qid, vec_id, approx_sim FROM r WHERE rn <= 5 ORDER BY qid, approx_sim DESC, vec_id""".stripMargin
  }

  /** PQ + exact rerank oracle (mirrors Similarity.pqTopKReranked): ADC
    * shortlist of `shortlist` per query, exact cosine over the stored
    * vectors, top `k`. */
  private def pqRerankOracleSql(shortlist: Int, k: Int): String = {
    val (cbJoin, approx) = pqAdcSql("q")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$pqTrainCtes,
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0,1,2)),
       |s AS (SELECT q.qid, k.vec_id, $approx AS approx_sim
       |  FROM q CROSS JOIN codes k $cbJoin
       |  WHERE k.vec_id <> q.qid),
       |sl AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY approx_sim DESC, vec_id) AS srn FROM s)
       |  WHERE srn <= $shortlist),
       |x AS (SELECT sl.qid, sl.vec_id, round(list_cosine_similarity(q2.qv, e2.v), 6) AS cos_sim
       |  FROM sl JOIN q q2 ON q2.qid = sl.qid JOIN e e2 ON e2.vec_id = sl.vec_id),
       |r AS (SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM x)
       |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= $k ORDER BY qid, cos_sim DESC, vec_id""".stripMargin
  }

  /** The composed IVF+PQ probe chain (mirrors Similarity.ivfPqTopKFor),
    * ending in `x(qid, vec_id, cos_sim)` — the exact-reranked shortlist:
    * both training unrolls, candidates restricted to each query's
    * `nprobe` best coarse clusters, ADC shortlist, exact rerank. Shared
    * by the ann_ivfpq_topk oracle and the hybrid_rrf_ann vector leg.
    * Assumes a CTE `e(vec_id, v)` is already defined. */
  private def ivfPqProbeChainCtes(nprobe: Int, shortlist: Int): String = {
    val (cbJoin, approx) = pqAdcSql("b")
    s"""$ivfTrainCtes,
       |$pqTrainCtes,
       |${ivfProbeCtes(nprobe)},
       |s AS (SELECT b.qid, a.vec_id, $approx AS approx_sim
       |  FROM best b JOIN af a ON a.c_id = b.c_id AND a.vec_id <> b.qid
       |  JOIN codes k ON k.vec_id = a.vec_id $cbJoin),
       |sl AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY approx_sim DESC, vec_id) AS srn FROM s)
       |  WHERE srn <= $shortlist),
       |x AS (SELECT sl.qid, sl.vec_id, round(list_cosine_similarity(q2.qv, e2.v), 6) AS cos_sim
       |  FROM sl JOIN q q2 ON q2.qid = sl.qid JOIN e e2 ON e2.vec_id = sl.vec_id)""".stripMargin
  }

  /** Composed IVF+PQ oracle (mirrors Similarity.ivfPqTopK): the probe
    * chain ranked to top `k`. */
  private def ivfPqOracleSql(nprobe: Int, shortlist: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${ivfPqProbeChainCtes(nprobe, shortlist)},
       |r AS (SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM x)
       |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= $k ORDER BY qid, cos_sim DESC, vec_id""".stripMargin

  /** Residual-encoded composed oracle (mirrors
    * Similarity.ivfPqResidualTopK — classical IVFADC): coarse k-means,
    * residuals r = v - c(v), 8 sub-k-means trained ON residuals, ADC
    * reconstruction dot(q,c) + sum_j dot(q_j, r̂_j) over norm
    * sqrt(||c||^2 + 2 sum_j dot(c_j, r̂_j) + sum_j ||r̂_j||^2), probe
    * restriction, shortlist, exact rerank. Every sum's association
    * order mirrors the Spark fold exactly. */
  private def ivfPqResidualOracleSql(nprobe: Int, shortlist: Int, k: Int): String = {
    val M = PqMOracle; val dsub = PqDsubOracle
    def off(j: Int) = j * dsub
    val cbJoin = (0 until M).map(j => s"JOIN c${j}_2 cb$j ON cb$j.c_id = k.k$j").mkString(" ")
    val dotR = (0 until M).map(j =>
      "(" + (1 to dsub).map(d => s"b.qv[${off(j) + d}]*cb$j.cv[$d]").mkString(" + ") + ")").mkString(" + ")
    val cdot = "(" + (1 to 64).map(d => s"b.qv[$d]*cc.cv[$d]").mkString(" + ") + ")"
    val cnorm = "(" + (1 to 64).map(d => s"cc.cv[$d]*cc.cv[$d]").mkString(" + ") + ")"
    val cross = (0 until M).map(j =>
      "(" + (1 to dsub).map(d => s"cc.cv[${off(j) + d}]*cb$j.cv[$d]").mkString(" + ") + ")").mkString(" + ")
    val rnorm = (0 until M).map(j =>
      "(" + (1 to dsub).map(d => s"cb$j.cv[$d]*cb$j.cv[$d]").mkString(" + ") + ")").mkString(" + ")
    val qnrm = (1 to 64).map(d => s"b.qv[$d]*b.qv[$d]").mkString(" + ")
    val resArr = "[" + (1 to 64).map(d => s"a.v[$d] - c.cv[$d]").mkString(", ") + "]"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$ivfTrainCtes,
       |er AS (SELECT a.vec_id, $resArr AS v FROM af a JOIN c2 c ON c.c_id = a.c_id),
       |${pqTrainCtesOver("er")},
       |${ivfProbeCtes(nprobe)},
       |s AS (SELECT b.qid, a.vec_id,
       |  round(($cdot + ($dotR)) / (sqrt($cnorm + 2.0*($cross) + ($rnorm)) * sqrt($qnrm)), 6) AS approx_sim
       |  FROM best b JOIN af a ON a.c_id = b.c_id AND a.vec_id <> b.qid
       |  JOIN c2 cc ON cc.c_id = b.c_id
       |  JOIN codes k ON k.vec_id = a.vec_id $cbJoin),
       |sl AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY approx_sim DESC, vec_id) AS srn FROM s)
       |  WHERE srn <= $shortlist),
       |x AS (SELECT sl.qid, sl.vec_id, round(list_cosine_similarity(q2.qv, e2.v), 6) AS cos_sim
       |  FROM sl JOIN q q2 ON q2.qid = sl.qid JOIN e e2 ON e2.vec_id = sl.vec_id),
       |r AS (SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM x)
       |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= $k ORDER BY qid, cos_sim DESC, vec_id"""
      .stripMargin
      // the training chain (er -> 8 sub-k-means -> codes) is referenced
      // many times — same exponential-inlining hazard as the sequential
      // replay oracles
      .replace(" AS (", " AS MATERIALIZED (")
  }

  /** Sequential unroll of the streaming curation gates (mirrors
    * CurationPipeline.processBatch batch for batch): for each batch in
    * ascending order — exact gate (min doc_id per fingerprint within
    * the batch, then anti-join against fps of ALL earlier survivors),
    * then the banded near-dup gate (band-key candidates vs earlier
    * survivors and vs smaller-id exact survivors in the batch, verified
    * by the 32-component signature estimator). */
  private def curationReplaySql(nBatches: Int, threshold: Double): String =
    curationReplayCore(nBatches, threshold, "",
      "SELECT doc_id, batch_id FROM srv ORDER BY doc_id")

  /** `curation_replay_decontam` oracle: the same sequential gate unroll,
    * then the 13-gram benchmark gate (bench = doc_id % 20 = 0, so a
    * bench doc in the corpus flags itself) and the 64/8 chunk math over
    * the surviving CLEAN docs — mirrors the chunk sink under benchDir.
    * Contamination per doc is batch-independent, so one global flag
    * table equals the Spark side's per-batch gate. */
  private def curationReplayDecontamSql(nBatches: Int, threshold: Double): String =
    curationReplayCore(nBatches, threshold,
      s""",
         |wrd2 AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |gl2 AS (SELECT doc_id, CASE WHEN len(ws) < 13 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-12), i -> array_to_string(list_slice(ws, i, i+12), ' ')) END AS garr
         |  FROM wrd2 WHERE len(ws) > 0),
         |g2 AS (SELECT DISTINCT doc_id, unnest(garr) AS gram FROM gl2),
         |flg AS (SELECT DISTINCT cg.doc_id FROM g2 cg
         |  JOIN (SELECT gram FROM g2 WHERE doc_id % 20 = 0) bg USING (gram)),
         |cln AS (SELECT s.doc_id, s.batch_id FROM srv s
         |  LEFT JOIN flg f ON f.doc_id = s.doc_id WHERE f.doc_id IS NULL),
         |cn2 AS (SELECT c.doc_id, c.batch_id, w.ws, len(w.ws) AS n FROM cln c JOIN wrd2 w USING (doc_id)),
         |cc2 AS (SELECT doc_id, batch_id, ws, greatest(CAST(1 AS BIGINT), CAST(ceil((n - 8) / 56.0) AS BIGINT)) AS n_chunks FROM cn2),
         |cx2 AS (SELECT doc_id, batch_id, ws, unnest(generate_series(0, n_chunks - 1)) AS ci FROM cc2),
         |cy2 AS (SELECT doc_id, batch_id, len(list_slice(ws, ci*56 + 1, ci*56 + 64)) AS nt FROM cx2),
         |ca2 AS (SELECT doc_id, batch_id, CAST(count(*) AS BIGINT) AS n_chunks, CAST(sum(nt) AS BIGINT) AS n_tokens
         |  FROM cy2 GROUP BY 1, 2)""".stripMargin,
      "SELECT doc_id, batch_id, n_chunks, n_tokens FROM ca2 ORDER BY doc_id")

  private def curationReplayCore(nBatches: Int, threshold: Double,
                                 extraCtes: String, finalSelect: String): String = {
    def estDrop(cands: String, out: String) =
      s"""$out AS (SELECT DISTINCT doc_a AS doc_id FROM (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE)/32 AS e
         |  FROM ($cands) c
         |  JOIN mh x ON x.doc_id = c.doc_a
         |  JOIN mh y ON y.doc_id = c.doc_b AND y.i = x.i
         |  GROUP BY c.doc_a, c.doc_b) WHERE e >= $threshold)""".stripMargin
    val perBatch = (0 until nBatches).map { b =>
      val keep =
        s"""keep$b AS (SELECT doc_id, fp FROM (
           |  SELECT doc_id, fp, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           |  FROM fpt WHERE b = $b) WHERE rn = 1)""".stripMargin
      val ex =
        if (b == 0) s"ex$b AS (SELECT doc_id, fp FROM keep$b)"
        else s"ex$b AS (SELECT doc_id, fp FROM keep$b WHERE fp NOT IN (SELECT fp FROM idxfp${b - 1}))"
      val dropOld = if (b == 0) "" else estDrop(
        s"""SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
           |    FROM bt ba JOIN ex$b e1 ON ba.doc_id = e1.doc_id
           |    JOIN bt bb ON ba.band = bb.band AND ba.band_key = bb.band_key
           |    JOIN prv$b p ON bb.doc_id = p.doc_id
           |    WHERE ba.doc_id <> bb.doc_id""".stripMargin, s"do$b")
      val dropNew = estDrop(
        s"""SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
           |    FROM bt ba JOIN ex$b e1 ON ba.doc_id = e1.doc_id
           |    JOIN bt bb ON ba.band = bb.band AND ba.band_key = bb.band_key
           |    JOIN ex$b e2 ON bb.doc_id = e2.doc_id
           |    WHERE ba.doc_id > bb.doc_id""".stripMargin, s"dn$b")
      val out =
        s"""out$b AS (SELECT doc_id, fp FROM ex$b
           |  WHERE doc_id NOT IN (SELECT doc_id FROM dn$b)${
             if (b == 0) "" else s" AND doc_id NOT IN (SELECT doc_id FROM do$b)"})""".stripMargin
      val idxfp =
        if (b == 0) s"idxfp$b AS (SELECT DISTINCT fp FROM out$b)"
        else s"idxfp$b AS (SELECT fp FROM idxfp${b - 1} UNION SELECT fp FROM out$b)"
      val prv =
        if (b + 1 >= nBatches) ""
        else if (b == 0) s"prv${b + 1} AS (SELECT doc_id FROM out$b)"
        else s"prv${b + 1} AS (SELECT doc_id FROM prv$b UNION ALL SELECT doc_id FROM out$b)"
      Seq(keep, ex, dropOld, dropNew, out, idxfp, prv).filter(_.nonEmpty).mkString(",\n")
    }.mkString(",\n")
    val finalUnion = (0 until nBatches)
      .map(b => s"SELECT doc_id, CAST($b AS BIGINT) AS batch_id FROM out$b")
      .mkString(" UNION ALL ")
    s"""WITH $ShinglesCte,
       |hsh AS (SELECT doc_id, ${md5LongSql("sh")} % 2147483647 AS hm FROM sh),
       |mh AS (SELECT doc_id, i, min(((2*i+1)*hm + i*i+7) % 2147483647) AS mh
       |  FROM hsh CROSS JOIN (SELECT unnest(generate_series(0,31)) AS i) GROUP BY 1, 2),
       |bt AS (SELECT doc_id, i//4 AS band, string_agg(concat(i%4, ':', mh), ',' ORDER BY i%4) AS band_key
       |  FROM mh GROUP BY 1, 2),
       |fpt AS (SELECT doc_id, md5(lower(text)) AS fp, doc_id % $nBatches AS b
       |  FROM documents WHERE text IS NOT NULL),
       |$perBatch,
       |srv AS (SELECT doc_id, batch_id FROM ($finalUnion))$extraCtes
       |$finalSelect"""
      .stripMargin
      // MATERIALIZED is load-bearing, not a hint: the per-batch CTE
      // chain references each level several times (ex in dn/do/out, out
      // in idx/prv, idx in the next batch's ex ...), so DuckDB's default
      // inlining re-evaluates the whole prior chain per reference —
      // exponential in the batch count. At sf0.1 the inlined form
      // spilled past 80 GB of temp before failing; materialized it runs
      // in ~2 s with identical results (verified against the Spark
      // output at both scales).
      .replace(" AS (", " AS MATERIALIZED (")
  }

  /** Sequential unroll of the streaming VECTOR gate (mirrors
    * CurationPipeline.processVectorBatch / Similarity.incrementalNearDup
    * batch for batch): sign-bucket + Hamming-1 probe candidates, cosine
    * verification with zero-norm guards, index = earlier survivors. */
  private def vectorReplaySql(nBatches: Int, threshold: Double): String = {
    // Candidate generation mirrors Similarity.incrementalNearDup at the
    // AUTO-SIZED nbits (Similarity.autoNBits — the embedding_near_dup
    // formula: GREATEST(4, CEIL(LOG2(n/125))), exact at power-of-two
    // ratios): each x row explodes to its own bucket + the nbits
    // Hamming-1 probe buckets, then an EQUALITY join on y's bucket —
    // the same probe-side explode the Spark plan runs.
    val guards =
      "list_inner_product(x.v, x.v) > 0 AND list_inner_product(y.v, y.v) > 0"
    val perBatch = (0 until nBatches).map { b =>
      val dropOld = if (b == 0) "" else
        s"""vdo$b AS (SELECT DISTINCT x.vec_id FROM vnp x JOIN vn y
           |  ON x.probe_bkt = y.bkt AND x.vec_id <> y.vec_id
           |  WHERE x.b = $b AND y.vec_id IN (SELECT vec_id FROM vprv$b)
           |    AND $guards
           |    AND list_cosine_similarity(x.v, y.v) >= $threshold)""".stripMargin
      val dropNew =
        s"""vdn$b AS (SELECT DISTINCT x.vec_id FROM vnp x JOIN vn y
           |  ON x.probe_bkt = y.bkt AND x.vec_id > y.vec_id
           |  WHERE x.b = $b AND y.b = $b
           |    AND $guards
           |    AND list_cosine_similarity(x.v, y.v) >= $threshold)""".stripMargin
      val out =
        s"""vout$b AS (SELECT vec_id FROM vn WHERE b = $b
           |  AND vec_id NOT IN (SELECT vec_id FROM vdn$b)${
             if (b == 0) "" else s" AND vec_id NOT IN (SELECT vec_id FROM vdo$b)"})""".stripMargin
      val prv =
        if (b + 1 >= nBatches) ""
        else if (b == 0) s"vprv${b + 1} AS (SELECT vec_id FROM vout$b)"
        else s"vprv${b + 1} AS (SELECT vec_id FROM vprv$b UNION ALL SELECT vec_id FROM vout$b)"
      Seq(dropOld, dropNew, out, prv).filter(_.nonEmpty).mkString(",\n")
    }.mkString(",\n")
    val finalUnion = (0 until nBatches)
      .map(b => s"SELECT vec_id, CAST($b AS BIGINT) AS batch_id FROM vout$b")
      .mkString(" UNION ALL ")
    s"""WITH vnb AS (SELECT GREATEST(4, CAST(CEIL(LOG2(CAST(count(*) AS DOUBLE) / 125.0)) AS INTEGER)) AS nbits FROM embeddings),
       |ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, vec_id % $nBatches AS b FROM embeddings),
       |vn AS (SELECT vec_id, v, b,
       |  CAST(list_sum(list_transform(range(1, (SELECT nbits FROM vnb) + 1),
       |    i -> CASE WHEN v[i] >= 0 THEN CAST(1 AS BIGINT) << (i-1) ELSE 0 END)) AS BIGINT) AS bkt FROM ve),
       |vnp AS (SELECT vec_id, v, b, unnest([bkt] || list_transform(range(0, (SELECT nbits FROM vnb)),
       |    i -> xor(bkt, CAST(1 AS BIGINT) << i))) AS probe_bkt FROM vn),
       |$perBatch
       |SELECT vec_id, batch_id FROM ($finalUnion) ORDER BY vec_id"""
      .stripMargin
      // same exponential-inlining hazard as curationReplaySql
      .replace(" AS (", " AS MATERIALIZED (")
  }

  def oracleSql: Map[String, String] = Map(
    "latest_tick" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM events
        |WHERE user_id = 7 ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin,

    "daily_stats" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS trade_date, min(value) AS low_price,
        |max(value) AS high_price, round(sum(value),3) AS total_value, count(*) AS tick_count
        |FROM events WHERE user_id = 7 GROUP BY 1 ORDER BY trade_date DESC""".stripMargin,

    "token_freshness" ->
      """SELECT user_id, epoch_us(max(ts)) AS last_ts_us, count(*) AS tick_count FROM events
        |WHERE user_id IN (1,7,42,99) GROUP BY user_id ORDER BY user_id""".stripMargin,

    "latest_prices_topk" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, value FROM events
        |WHERE user_id IN (1,7,42,99) ORDER BY ts DESC, event_id DESC LIMIT 10""".stripMargin,

    "daily_ohlcv" ->
      """WITH e AS (SELECT *, CAST(CAST(ts AS DATE) AS VARCHAR) AS trade_date FROM events WHERE user_id = 7),
        |w AS (SELECT *, row_number() OVER (PARTITION BY trade_date ORDER BY ts, event_id) AS rna,
        |  row_number() OVER (PARTITION BY trade_date ORDER BY ts DESC, event_id DESC) AS rnd FROM e)
        |SELECT trade_date, max(CASE WHEN rna = 1 THEN value END) AS open_price, max(value) AS high_price,
        |  min(value) AS low_price, max(CASE WHEN rnd = 1 THEN value END) AS close_price,
        |  round(sum(value),3) AS total_value, count(*) AS tick_count
        |FROM w GROUP BY trade_date ORDER BY trade_date DESC""".stripMargin,

    "volume_profile" ->
      """SELECT user_id, round(value, 0) AS price_level, count(*) AS tick_count,
        |round(sum(value),3) AS total_value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 7 DAY
        |GROUP BY 1, 2 ORDER BY user_id, price_level""".stripMargin,

    "enriched_by_segment" ->
      """SELECT c_mktsegment, count(*) AS tick_count, round(sum(value),3) AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "scaled_projection" ->
      """SELECT event_id, round(value/100.0, 4) AS scaled_value, round(value, 2) AS rounded_value
        |FROM events ORDER BY event_id""".stripMargin,

    "time_range_scan" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 1 DAY
        |AND ts < TIMESTAMP '2024-01-31 00:00:00' ORDER BY event_id""".stripMargin,

    "token_stats" ->
      """SELECT user_id, min(value) AS min_price, max(value) AS max_price,
        |CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_price,
        |round(sum(value),3) AS total_value,
        |count(*) AS tick_count, epoch_us(max(ts)) AS last_update_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "mode_conditional" ->
      """SELECT event_id, event_type,
        |CASE WHEN event_type IN ('purchase','click') THEN round(value, 2) END AS quote_value
        |FROM events ORDER BY event_id""".stripMargin,

    "hourly_bars" ->
      """WITH e AS (SELECT *, date_trunc('hour', ts) AS bar_ts FROM events),
        |w AS (SELECT *, row_number() OVER (PARTITION BY bar_ts, event_type ORDER BY ts, event_id) AS rna,
        |  row_number() OVER (PARTITION BY bar_ts, event_type ORDER BY ts DESC, event_id DESC) AS rnd FROM e)
        |SELECT epoch_us(bar_ts) AS bar_start_us, event_type,
        |  max(CASE WHEN rna = 1 THEN value END) AS open_price, max(value) AS high_price,
        |  min(value) AS low_price, max(CASE WHEN rnd = 1 THEN value END) AS close_price,
        |  count(*) AS tick_count
        |FROM w GROUP BY 1, 2 ORDER BY bar_start_us, event_type""".stripMargin,

    "seq_dedup" ->
      """SELECT user_id, count(DISTINCT event_id) AS tick_count FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "asof_price" ->
      """WITH f AS (SELECT * FROM events WHERE user_id IN (1,7,42,99)
        |  AND ts <= TIMESTAMP '2024-01-15 12:00:00'),
        |w AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM f)
        |SELECT user_id, max(CASE WHEN rn = 1 THEN value END) AS asof_price,
        |  epoch_us(max(ts)) AS asof_ts_us
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "tick_returns" ->
      """SELECT event_id, user_id, value,
        |round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS price_change
        |FROM events WHERE user_id IN (1,7,42,99) ORDER BY event_id""".stripMargin,

    // mirrors MarketQueries.priceJumps: round-6 decimal returns, exact
    // per-token sums, identical IEEE band arithmetic
    "price_jumps" ->
      """WITH r AS (SELECT event_id, user_id, ts, value,
        |  CAST(round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS DECIMAL(18,6)) AS r6 FROM events),
        |rr AS (SELECT * FROM r WHERE r6 IS NOT NULL),
        |st AS (SELECT user_id, count(*) AS n, sum(r6) AS sr, sum(r6 * r6) AS sr2 FROM rr GROUP BY 1),
        |j AS (SELECT rr.event_id, rr.user_id, rr.ts, rr.value, rr.r6,
        |  CAST(sr AS DOUBLE) / n AS mean,
        |  sqrt(CAST(sr2 AS DOUBLE) / n - (CAST(sr AS DOUBLE) / n) * (CAST(sr AS DOUBLE) / n)) AS sdev
        |  FROM rr JOIN st USING (user_id))
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
        |  CAST(r6 AS DOUBLE) AS ret, round((CAST(r6 AS DOUBLE) - mean) / sdev, 4) AS z
        |FROM j WHERE abs(CAST(r6 AS DOUBLE) - mean) > CAST(3.0 AS DOUBLE) * sdev
        |ORDER BY event_id""".stripMargin,

    // mirrors MarketQueries.ewmaPrices: dyadic weights are exponent
    // shifts and the 16-term addition chain is the same left-to-right
    // IEEE sequence in both engines — NO output rounding needed
    "ewma_prices" ->
      """WITH l AS (SELECT event_id, user_id, ts, value,
        |  row_number() OVER win AS rn,
        |  lag(value, 1) OVER win AS l1, lag(value, 2) OVER win AS l2,
        |  lag(value, 3) OVER win AS l3, lag(value, 4) OVER win AS l4,
        |  lag(value, 5) OVER win AS l5, lag(value, 6) OVER win AS l6,
        |  lag(value, 7) OVER win AS l7, lag(value, 8) OVER win AS l8,
        |  lag(value, 9) OVER win AS l9, lag(value, 10) OVER win AS l10,
        |  lag(value, 11) OVER win AS l11, lag(value, 12) OVER win AS l12,
        |  lag(value, 13) OVER win AS l13, lag(value, 14) OVER win AS l14,
        |  lag(value, 15) OVER win AS l15
        |  FROM events WHERE user_id IN (1,7,42,99)
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
        |  value/2 + l1/4 + l2/8 + l3/16 + l4/32 + l5/64 + l6/128 + l7/256
        |  + l8/512 + l9/1024 + l10/2048 + l11/4096 + l12/8192 + l13/16384
        |  + l14/32768 + l15/32768 AS ewma
        |FROM l WHERE rn >= 16 ORDER BY event_id""".stripMargin,

    // mirrors MarketQueries.vwapDaily: exact DECIMAL(10,2) x k products,
    // order-free sums, portable round-6 on the quotient (ORACLE.md's
    // guaranteed-tie case: a decimal sum divided by an integer)
    "vwap_daily" ->
      """WITH t AS (SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(value AS DECIMAL(10,2)) AS p FROM events),
        |g AS (SELECT user_id, date, count(*) AS n_trades,
        |  CAST(sum(k) AS BIGINT) AS qty, sum(p * k) AS pv_sum
        |  FROM t GROUP BY 1, 2)
        |SELECT user_id, date, n_trades, qty,
        |  floor(CAST(pv_sum AS DOUBLE) / qty * 1000000.0 + 0.5) / 1000000.0 AS vwap
        |FROM g WHERE qty > 0 ORDER BY user_id, date""".stripMargin,

    // mirrors MarketQueries.zorderKey / TickTable.morton16: the same 16
    // unrolled shift/mask interleave terms (pure integer bit arithmetic)
    "zorder_key" -> {
      val z = (0 until 16).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH b AS (SELECT event_id, user_id & 65535 AS x,
         |  (epoch_us(ts) // 60000000) & 65535 AS y FROM events)
         |SELECT event_id, x, y, $z AS z
         |FROM b ORDER BY z, event_id LIMIT 50""".stripMargin
    },

    "set_ops" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id""".stripMargin,

    "except_tokens" ->
      """SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS date
        |FROM events WHERE event_type = 'purchase'
        |EXCEPT SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR)
        |FROM events WHERE event_type = 'error'
        |ORDER BY user_id, date""".stripMargin,

    // independent formulation: DuckDB's native ASOF JOIN checks our
    // union+window implementation from a different algorithm entirely
    "asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click' AND user_id IN (1,7,42,99)),
        |purchases AS (SELECT user_id, ts, max(value) AS pvalue FROM events
        |  WHERE event_type = 'purchase' AND user_id IN (1,7,42,99) GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, c.value,
        |  round(p.pvalue, 4) AS asof_pvalue
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "cum_volume" ->
      """SELECT event_id, user_id,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING), 4) AS cum_value
        |FROM events WHERE user_id IN (1,7,42,99) ORDER BY event_id""".stripMargin,

    "rank_by_day" ->
      """SELECT event_id, user_id,
        |CAST(dense_rank() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |  ORDER BY value DESC) AS BIGINT) AS value_rank
        |FROM events WHERE user_id IN (1,7,42,99) ORDER BY event_id""".stripMargin,

    "event_gaps" ->
      """SELECT event_id, user_id,
        |lead(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |  - epoch_us(ts) AS gap_us
        |FROM events WHERE user_id IN (1,7,42,99) ORDER BY event_id""".stripMargin,

    "range_join_errors" ->
      """WITH f AS (SELECT * FROM events WHERE user_id IN (1,7,42,99)),
        |l AS (SELECT *, CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 14400000000
        |  THEN 1 ELSE 0 END AS new_session FROM f),
        |s AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM l),
        |sess AS (SELECT user_id, session_id, epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
        |  FROM s GROUP BY 1, 2)
        |SELECT e.user_id, sess.session_id, count(*) AS n_errors
        |FROM events e JOIN sess ON e.user_id = sess.user_id
        |  AND epoch_us(e.ts) BETWEEN sess.s_us AND sess.e_us
        |WHERE e.event_type = 'error' AND e.user_id IN (1,7,42,99)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "cube_stats" ->
      """SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
        |count(*) AS tick_count, round(sum(value),3) AS total_value
        |FROM events WHERE user_id IN (1,7,42,99)
        |GROUP BY CUBE(event_type, CAST(CAST(ts AS DATE) AS VARCHAR))
        |ORDER BY event_type NULLS FIRST, date NULLS FIRST""".stripMargin,

    "rollup_stats" ->
      """SELECT event_type, count(*) AS tick_count, round(sum(value),3) AS total_value
        |FROM events GROUP BY ROLLUP(event_type) ORDER BY event_type NULLS FIRST""".stripMargin,

    "distinct_counts" ->
      """SELECT user_id, count(DISTINCT event_type) AS n_types, count(*) AS tick_count
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "json_props" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS tick_count,
        |round(sum(value),3) AS total_value FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "time_format" ->
      """SELECT event_id, strftime(ts, '%H:%M') AS hhmm,
        |strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_formatted
        |FROM events WHERE user_id = 7 ORDER BY event_id""".stripMargin,

    "tpch_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),3) AS sum_qty,
        |round(sum(l_extendedprice),3) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |round(avg(l_quantity),4) AS avg_qty,
        |CAST(sum(CAST(l_discount AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_disc,
        |count(*) AS count_order FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "tpch_top_orders" ->
      """SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "revenue_by_region" ->
      """SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice),3) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "brand_revenue" ->
      """SELECT p_brand, count(*) AS n_items,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "supplier_summary" ->
      """SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal),3) AS total_balance
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, md5(lower(text)) AS content_hash, count(*) AS n_dups
        |FROM documents GROUP BY 2 ORDER BY keep_id""".stripMargin,

    // mirrors TextDedup.exactNormalized: ASCII-class normalization
    // (identical in Java regex and RE2), md5 group, raw-variant count
    "dedup_exact_normalized" ->
      """SELECT min(doc_id) AS keep_id,
        |md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS content_hash,
        |count(*) AS n_dups,
        |count(DISTINCT md5(lower(text))) AS n_raw_variants
        |FROM documents GROUP BY 2 ORDER BY keep_id""".stripMargin,

    "dedup_ngram" ->
      s"""WITH $JaccardCte
         |SELECT doc_a, doc_b, jaccard FROM jac ORDER BY doc_a, doc_b""".stripMargin,

    // mirrors SubstringDedup.substringDedupStats (n = 10): positional
    // 10-gram md5 keys, corpus-first occurrence keeps (row_number over
    // (doc_id, pos)), gaps-and-islands merge with adjacency, cleaned
    // text rebuilt by filtering removed 1-based word positions
    "dedup_substring" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |gl AS (SELECT doc_id, list_transform(generate_series(1, len(ws)-9), i ->
         |  {'pos': i, 'gk': md5(array_to_string(list_slice(ws, i, i+9), ' '))}) AS garr
         |  FROM wrd WHERE len(ws) >= 10),
         |g AS (SELECT doc_id, unnest(garr, recursive := true) FROM gl),
         |dup AS (SELECT doc_id, pos AS s, pos + 9 AS e FROM (
         |  SELECT doc_id, pos, row_number() OVER (PARTITION BY gk ORDER BY doc_id, pos) AS rn FROM g) WHERE rn > 1),
         |brk AS (SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER (
         |    PARTITION BY doc_id ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
         |  THEN 1 ELSE 0 END AS b FROM dup),
         |isl AS (SELECT doc_id, s, e, sum(b) OVER (
         |  PARTITION BY doc_id ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isle FROM brk),
         |m AS (SELECT doc_id, isle, min(s) AS s, max(e) AS e FROM isl GROUP BY 1, 2),
         |agg AS (SELECT doc_id, count(*) AS n_spans, CAST(sum(e - s + 1) AS BIGINT) AS words_removed,
         |  list(s ORDER BY s) AS ss, list(e ORDER BY s) AS es FROM m GROUP BY 1)
         |SELECT a.doc_id, a.n_spans, a.words_removed, CAST(len(w.ws) AS BIGINT) AS n_words,
         |  md5(coalesce(array_to_string(list_transform(list_filter(generate_series(1, len(w.ws)),
         |    p -> len(list_filter(generate_series(1, len(a.ss)), j -> p >= a.ss[j] AND p <= a.es[j])) = 0),
         |    p -> w.ws[p]), ' '), '')) AS clean_md5
         |FROM agg a JOIN wrd w USING (doc_id) ORDER BY a.doc_id""".stripMargin,

    // deliberately the UNFILTERED formulation: the PPJoin filters are
    // exact-preserving, so hash-equality against the full inverted-index
    // oracle is the losslessness proof
    "dedup_ngram_ppjoin" ->
      s"""WITH $JaccardCte
         |SELECT doc_a, doc_b, jaccard FROM jac ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $JaccardCte,
         |hsh AS (SELECT doc_id, ${md5LongSql("sh")} % 2147483647 AS hm FROM sh),
         |mh AS (SELECT doc_id, i, min(((2*i+1)*hm + i*i+7) % 2147483647) AS mh
         |  FROM hsh CROSS JOIN (SELECT unnest(generate_series(0,31)) AS i) GROUP BY 1, 2),
         |bt AS (SELECT doc_id, i//4 AS band, string_agg(concat(i%4, ':', mh), ',' ORDER BY i%4) AS band_key
         |  FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bt a
         |  JOIN bt b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
         |SELECT j.doc_a, j.doc_b, j.jaccard FROM jac j JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
         |ORDER BY j.doc_a, j.doc_b""".stripMargin,

    // banded candidates scored by the MinHash SIGNATURE estimator
    // (agreeing components / 32) — the batch form of the curation
    // pipeline's cross-run near-dup verification predicate
    "dedup_minhash_est" ->
      s"""WITH $ShinglesCte,
         |hsh AS (SELECT doc_id, ${md5LongSql("sh")} % 2147483647 AS hm FROM sh),
         |mh AS (SELECT doc_id, i, min(((2*i+1)*hm + i*i+7) % 2147483647) AS mh
         |  FROM hsh CROSS JOIN (SELECT unnest(generate_series(0,31)) AS i) GROUP BY 1, 2),
         |bt AS (SELECT doc_id, i//4 AS band, string_agg(concat(i%4, ':', mh), ',' ORDER BY i%4) AS band_key
         |  FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bt a
         |  JOIN bt b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |est AS (SELECT c.doc_a, c.doc_b,
         |  CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE)/32 AS e
         |  FROM cand c JOIN mh x ON x.doc_id = c.doc_a
         |  JOIN mh y ON y.doc_id = c.doc_b AND y.i = x.i GROUP BY 1, 2)
         |SELECT doc_a, doc_b, round(e, 6) AS est_jaccard FROM est
         |WHERE e >= 0.2 ORDER BY doc_a, doc_b""".stripMargin,

    // decontamination: training docs (doc_id % 20 != 0) that are banded
    // near-dups of the held-out "benchmark" (doc_id % 20 == 0), scored by
    // the signature estimator
    "decontamination" ->
      s"""WITH $ShinglesCte,
         |hsh AS (SELECT doc_id, ${md5LongSql("sh")} % 2147483647 AS hm FROM sh),
         |mh AS (SELECT doc_id, i, min(((2*i+1)*hm + i*i+7) % 2147483647) AS mh
         |  FROM hsh CROSS JOIN (SELECT unnest(generate_series(0,31)) AS i) GROUP BY 1, 2),
         |bt AS (SELECT doc_id, i//4 AS band, string_agg(concat(i%4, ':', mh), ',' ORDER BY i%4) AS band_key
         |  FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS bench_id FROM bt a
         |  JOIN bt b ON a.band = b.band AND a.band_key = b.band_key
         |  WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0),
         |est AS (SELECT c.doc_id, c.bench_id,
         |  CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE)/32 AS e
         |  FROM cand c JOIN mh x ON x.doc_id = c.doc_id
         |  JOIN mh y ON y.doc_id = c.bench_id AND y.i = x.i GROUP BY 1, 2)
         |SELECT doc_id, bench_id, round(e, 6) AS est_jaccard FROM est
         |WHERE e >= 0.2 ORDER BY doc_id, bench_id""".stripMargin,

    // exact 13-gram containment (mirrors TextDedup.exactNgramContamination:
    // short docs contribute their whole text as one gram, hits = distinct
    // shared grams per (training doc, benchmark doc) pair)
    "decontamination_ngram" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |gl AS (SELECT doc_id, CASE WHEN len(ws) < 13 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-12), i -> array_to_string(list_slice(ws, i, i+12), ' ')) END AS garr FROM wrd WHERE len(ws) > 0),
         |g AS (SELECT DISTINCT doc_id, unnest(garr) AS gram FROM gl),
         |c AS (SELECT doc_id, gram FROM g WHERE doc_id % 20 <> 0),
         |b AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 20 = 0)
         |SELECT c.doc_id, b.bench_id, count(*) AS n_hits
         |FROM c JOIN b USING (gram)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // bloom-prefiltered variant: the bloom stage is a lossless plan
    // optimization, so the oracle is the SAME exact-containment SQL
    "decontamination_bloom" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |gl AS (SELECT doc_id, CASE WHEN len(ws) < 13 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-12), i -> array_to_string(list_slice(ws, i, i+12), ' ')) END AS garr FROM wrd WHERE len(ws) > 0),
         |g AS (SELECT DISTINCT doc_id, unnest(garr) AS gram FROM gl),
         |c AS (SELECT doc_id, gram FROM g WHERE doc_id % 20 <> 0),
         |b AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 20 = 0)
         |SELECT c.doc_id, b.bench_id, count(*) AS n_hits
         |FROM c JOIN b USING (gram)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // embedding-space decontamination (mirrors
    // Similarity.semanticDecontamination: exact cosine of every corpus
    // vector against the tiny benchmark side, threshold 0.35; the
    // vec_id < 2000 cap pins the fixture's bench size — a real eval
    // suite doesn't grow with the training corpus)
    "decontamination_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id % 20 = 0 AND vec_id < 2000),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id % 20 <> 0)
        |SELECT vec_id, bench_id, round(list_cosine_similarity(v, bv), 6) AS cos_sim
        |FROM c CROSS JOIN b
        |WHERE round(list_cosine_similarity(v, bv), 6) >= 0.35
        |ORDER BY vec_id, bench_id""".stripMargin,

    // components over the EXACT Jaccard pair graph (recursive transitive
    // closure — algorithm independent of Spark's label propagation)
    "dedup_ngram_clusters" ->
      s"""WITH RECURSIVE $JaccardCte,
         |${docComponentsSql("jac")}""".stripMargin,

    "dedup_ngram_clusters_t50" ->
      s"""WITH RECURSIVE ${jaccardCteAt(0.5)},
         |${docComponentsSql("jac")}""".stripMargin,

    // connected components via recursive transitive closure over the
    // VERIFIED minhash pair graph (algorithm independent of the Spark
    // side's label propagation, like dedup_simhash_clusters);
    // un-paired docs become singleton clusters via the LEFT JOIN
    "dedup_minhash_clusters" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsSql("mhp")}""".stripMargin,

    // mirrors GraphOps.pagerankNearDup round for round: symmetrized
    // mhp edges, portable-round-6 contributions as DECIMAL (exact
    // order-free sums), exact-decimal damping, unrolled 5 iterations
    "pagerank_neardup" -> {
      val iters = 5
      val chain = (1 to iters).map { k =>
        s"""c$k AS (SELECT e.doc_b AS doc_id,
           |  CAST(sum(CAST(floor(CAST(r.rank AS DOUBLE) / r.deg * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS s
           |  FROM ed e JOIN r${k - 1} r ON e.doc_a = r.doc_id GROUP BY 1),
           |r$k AS (SELECT nd.doc_id, nd.deg,
           |  CAST(round(pb.b + CAST(0.85 AS DECIMAL(3,2)) * coalesce(c$k.s, CAST(0 AS DECIMAL(18,6))), 6) AS DECIMAL(18,6)) AS rank
           |  FROM nd CROSS JOIN pb LEFT JOIN c$k ON nd.doc_id = c$k.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |ed AS (SELECT doc_a, doc_b FROM mhp UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM mhp),
         |nd AS (SELECT doc_a AS doc_id, count(*) AS deg FROM ed GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM nd),
         |pb AS (SELECT CAST(floor(CAST(0.15 AS DOUBLE) / n * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS b,
         |  CAST(floor(CAST(1.0 AS DOUBLE) / n * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS r0v FROM nn),
         |r0 AS (SELECT doc_id, deg, r0v AS rank FROM nd CROSS JOIN pb),
         |$chain
         |SELECT doc_id, deg, CAST(rank AS DOUBLE) AS pagerank FROM r$iters ORDER BY doc_id""".stripMargin
    },

    // mirrors GraphOps.triangleStats: a<b<c oriented triangles via two
    // self-joins of mhp, grouped by the recursive-CC cluster rep
    "triangle_stats" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")},
         |clus AS (SELECT doc_id, cluster_rep FROM allc JOIN rep USING (comp)),
         |gn AS (SELECT cluster_rep, count(*) AS n_nodes FROM (
         |    SELECT doc_a AS doc_id FROM mhp UNION SELECT doc_b FROM mhp) p
         |  JOIN clus USING (doc_id) GROUP BY 1),
         |ge AS (SELECT c.cluster_rep, count(*) AS n_edges
         |  FROM mhp m JOIN clus c ON m.doc_a = c.doc_id GROUP BY 1),
         |tr AS (SELECT e1.doc_a AS a FROM mhp e1
         |  JOIN mhp e2 ON e1.doc_b = e2.doc_a
         |  JOIN mhp e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
         |gt AS (SELECT c.cluster_rep, count(*) AS n_triangles
         |  FROM tr JOIN clus c ON tr.a = c.doc_id GROUP BY 1)
         |SELECT gn.cluster_rep, n_nodes, n_edges,
         |  coalesce(n_triangles, 0) AS n_triangles
         |FROM gn JOIN ge USING (cluster_rep) LEFT JOIN gt USING (cluster_rep)
         |ORDER BY cluster_rep""".stripMargin,

    // mirrors TextDedup.crossSourceDups: least/greatest source pair,
    // portable-round-6 share of all verified pairs
    "cross_source_dups" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |sm AS (SELECT doc_id, source FROM documents),
         |sp AS (SELECT least(a.source, b.source) AS source_a,
         |  greatest(a.source, b.source) AS source_b
         |  FROM mhp JOIN sm a ON mhp.doc_a = a.doc_id
         |  JOIN sm b ON mhp.doc_b = b.doc_id),
         |tt AS (SELECT count(*) AS n_total FROM mhp),
         |gp AS (SELECT source_a, source_b, count(*) AS n_pairs
         |  FROM sp GROUP BY 1, 2)
         |SELECT source_a, source_b, n_pairs,
         |  floor(CAST(n_pairs AS DOUBLE) / n_total * 1000000.0 + 0.5) / 1000000.0 AS share6
         |FROM gp CROSS JOIN tt ORDER BY source_a, source_b""".stripMargin,

    // mirrors TextDedup.contrastivePairs: verified pair = (anchor,
    // positive); negative = the md5-min pool member outside the
    // anchor's cluster (pool = 16 docs by md5('neg:' id))
    "contrastive_pairs" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")},
         |clus AS (SELECT doc_id, cluster_rep FROM allc JOIN rep USING (comp)),
         |pool AS (SELECT p.neg_id, c.neg_rep FROM (
         |    SELECT doc_id AS neg_id, ${md5LongSql("'neg:' || doc_id")} AS pk FROM documents
         |    ORDER BY pk, neg_id LIMIT 16) p
         |  JOIN (SELECT doc_id AS neg_id, cluster_rep AS neg_rep FROM clus) c USING (neg_id)),
         |cnd AS (SELECT m.doc_a, m.doc_b, p.neg_id,
         |    ${md5LongSql("m.doc_a || ':' || p.neg_id")} AS nk
         |  FROM mhp m JOIN clus a ON a.doc_id = m.doc_a
         |  CROSS JOIN pool p WHERE p.neg_rep <> a.cluster_rep),
         |pick AS (SELECT doc_a, doc_b, neg_id,
         |  row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY nk, neg_id) AS rn FROM cnd)
         |SELECT doc_a, doc_b, neg_id FROM pick WHERE rn = 1
         |ORDER BY doc_a, doc_b""".stripMargin,

    // mirrors TextDedup.contrastiveHardNegatives: same pair/cluster
    // algebra + the auto-sized sign buckets; hard negative = top-cosine
    // same-bucket vector outside the anchor's cluster
    "contrastive_hard_negatives" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")},
         |clus AS (SELECT doc_id, cluster_rep FROM allc JOIN rep USING (comp)),
         |$EmbAutoBucketCte,
         |anc AS (SELECT m.doc_a, m.doc_b, a.cluster_rep, b.v AS av, b.bkt AS abkt
         |  FROM mhp m JOIN clus a ON a.doc_id = m.doc_a JOIN bkt b ON b.vec_id = m.doc_a),
         |hcand AS (SELECT anc.doc_a, anc.doc_b, nbr.vec_id AS neg_id,
         |    round(list_cosine_similarity(anc.av, nbr.v), 6) AS neg_cos
         |  FROM anc JOIN bkt nbr ON nbr.bkt = anc.abkt
         |  JOIN clus nc ON nc.doc_id = nbr.vec_id
         |  WHERE nc.cluster_rep <> anc.cluster_rep),
         |hpick AS (SELECT *, row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY neg_cos DESC, neg_id) AS rn FROM hcand)
         |SELECT doc_a, doc_b, neg_id, neg_cos FROM hpick WHERE rn = 1
         |ORDER BY doc_a, doc_b""".stripMargin,

    // same cluster algebra, split drawn from md5("split:" || rep)/2^60
    // against plain double thresholds (mirrors TextDedup.leakageFreeSplit)
    "leakage_free_split" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")},
         |cl AS (SELECT doc_id, cluster_rep FROM allc JOIN rep USING (comp)),
         |sp AS (SELECT doc_id, cluster_rep,
         |  CASE WHEN ${md5LongSql("concat('split:', CAST(cluster_rep AS VARCHAR))")} / CAST(1152921504606846976 AS DOUBLE) < CAST(0.75 AS DOUBLE) THEN 'train'
         |       WHEN ${md5LongSql("concat('split:', CAST(cluster_rep AS VARCHAR))")} / CAST(1152921504606846976 AS DOUBLE) < CAST(0.875 AS DOUBLE) THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM cl)
         |SELECT split, count(*) AS n_docs, count(DISTINCT cluster_rep) AS n_clusters,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    // same cluster algebra, production keep-rule (mirrors
    // TextDedup.dedupKeepBest: quality formula = the text_quality /
    // pipeline_filtered_docs oracle's, digit for digit)
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")},
         |cl AS (SELECT doc_id, cluster_rep, cluster_size FROM allc JOIN rep USING (comp)),
         |qb AS (SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS n_words,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio
         |  FROM documents),
         |qq AS (SELECT doc_id, round(least(CAST(1.0 AS DOUBLE), n_words / 50.0) * (CAST(1.0 AS DOUBLE) - punct_ratio), 4) AS quality_score FROM qb),
         |rk AS (SELECT cl.doc_id, cluster_rep, cluster_size, qq.quality_score,
         |  row_number() OVER (PARTITION BY cluster_rep ORDER BY qq.quality_score DESC, cl.doc_id) AS rn
         |  FROM cl JOIN qq ON qq.doc_id = cl.doc_id)
         |SELECT doc_id, cluster_rep, cluster_size, quality_score FROM rk WHERE rn = 1
         |ORDER BY cluster_rep""".stripMargin,

    // cluster-size histogram over the same verified minhash components
    "dedup_cluster_histogram" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")}
         |SELECT cluster_size, count(*) AS n_clusters FROM rep GROUP BY 1 ORDER BY 1""".stripMargin,

    "simhash_sigs" ->
      s"""WITH dw AS (SELECT DISTINCT doc_id, w FROM
         |  (SELECT doc_id, unnest($WordsSql) AS w FROM documents)),
         |wh AS (SELECT doc_id, ${md5LongSql("w")} AS wh FROM dw),
         |votes AS (SELECT doc_id, j, sum(CASE WHEN (wh >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM wh CROSS JOIN (SELECT unnest(generate_series(0,47)) AS j) GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sig
         |FROM votes GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "dedup_simhash" -> simhashPairsOracleSql("(SELECT lvl FROM nlvl)"),
    "dedup_simhash_clusters" -> simhashClustersOracleSql("(SELECT lvl FROM nlvl)"),
    // forced levels: the only hash-gate executions of the level-1/2
    // block-combination band algebra (see the queries-map comment)
    "dedup_simhash_l1" -> simhashPairsOracleSql("1"),
    "dedup_simhash_clusters_l1" -> simhashClustersOracleSql("1"),
    "dedup_simhash_clusters_l2" -> simhashClustersOracleSql("2"),

    "similarity_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0,1,2)),
        |s AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos_sim
        |  FROM q JOIN e ON vec_id <> qid),
        |r AS (SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
        |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= 10 ORDER BY qid, cos_sim DESC, vec_id""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH $EmbBucketCte,
         |q AS (SELECT vec_id AS qid, v AS qv, bkt AS qbkt FROM bkt WHERE vec_id IN (0,1,2)),
         |s AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos_sim
         |  FROM q JOIN bkt ON bkt = qbkt AND vec_id <> qid),
         |r AS (SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
         |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= 5 ORDER BY qid, cos_sim DESC, vec_id""".stripMargin,

    "ann_lsh_multiprobe" ->
      s"""WITH $EmbBucketCte,
         |q0 AS (SELECT vec_id AS qid, v AS qv, bkt AS qbkt0 FROM bkt WHERE vec_id IN (0,1,2)),
         |q AS (SELECT qid, qv, unnest([qbkt0, xor(qbkt0, 1), xor(qbkt0, 2), xor(qbkt0, 4), xor(qbkt0, 8)]) AS probe_bkt FROM q0),
         |s AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 6) AS cos_sim
         |  FROM q JOIN bkt ON bkt = probe_bkt AND vec_id <> qid),
         |r AS (SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
         |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= 5 ORDER BY qid, cos_sim DESC, vec_id""".stripMargin,

    // 4 independent sign-bucket tables over disjoint dim slices
    // (mirrors Similarity.lshMultiTableTopK)
    "ann_lsh_multitable" -> {
      def bktSql(j: Int) = (0 until 4).map(i =>
        s"CASE WHEN v[${4 * j + i + 1}] >= 0 THEN ${1 << i} ELSE 0 END").mkString(" + ")
      val tables = (0 until 4).map(j =>
        s"SELECT vec_id, v, $j AS t, ${bktSql(j)} AS bkt FROM e").mkString("\nUNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |tb AS ($tables),
         |q AS (SELECT vec_id AS qid, t, bkt FROM tb WHERE vec_id IN (0,1,2)),
         |cand AS (SELECT DISTINCT q.qid, tb.vec_id FROM q JOIN tb USING (t, bkt)
         |  WHERE tb.vec_id <> q.qid),
         |s AS (SELECT c.qid, c.vec_id, round(list_cosine_similarity(eq.v, ev.v), 6) AS cos_sim
         |  FROM cand c JOIN e eq ON eq.vec_id = c.qid JOIN e ev ON ev.vec_id = c.vec_id),
         |r AS (SELECT qid, vec_id, cos_sim, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
         |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= 5 ORDER BY qid, cos_sim DESC, vec_id""".stripMargin
    },

    // TRAINED quantizer, mirrored end-to-end: deterministic Lloyd's
    // k-means (sign-bucket min-vec_id seeds, exact-decimal mean updates,
    // IvfIterations=2 unrolled), final assignment as posting lists,
    // probe = best `nprobe` centroids by rounded cosine. No ground-truth
    // label anywhere on either side.
    "ann_ivf_topk" -> ivfOracleSql(nprobe = 1),
    "ann_ivf_nprobe2" -> ivfOracleSql(nprobe = 2),
    "ann_pq_topk" -> pqOracleSql,
    "ann_pq_rerank" -> pqRerankOracleSql(shortlist = 20, k = 5),
    "ann_ivfpq_topk" -> ivfPqOracleSql(nprobe = 2, shortlist = 20, k = 5),
    "ann_ivfpq_residual" -> ivfPqResidualOracleSql(nprobe = 2, shortlist = 20, k = 5),

    "embedding_near_dup" ->
      s"""WITH $EmbAutoBucketCte
         |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, round(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
         |FROM bkt x JOIN bkt y ON x.bkt = y.bkt AND x.vec_id < y.vec_id
         |WHERE round(list_cosine_similarity(x.v, y.v), 6) >= 0.35 ORDER BY vec_a, vec_b""".stripMargin,

    "mmr_rerank" -> mmrOracleSql(k = 5, shortlist = 20),

    // mirrors Similarity.clusterBalancedSample: trained-IVF assignment
    // (same unrolled Lloyd), up to 10 picks per cluster in md5 order
    "cluster_balanced_sample" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$ivfTrainCtes,
         |sk AS (SELECT vec_id, c_id, ${md5LongSql("'cs:' || vec_id")} AS sk FROM af),
         |r AS (SELECT vec_id, c_id, row_number() OVER (PARTITION BY c_id ORDER BY sk, vec_id) AS pick_rank FROM sk)
         |SELECT vec_id, c_id, CAST(pick_rank AS INTEGER) AS pick_rank FROM r WHERE pick_rank <= 10 ORDER BY c_id, pick_rank""".stripMargin,

    // mirrors TextAnalysis.hllGramCardinality: md5-derived registers
    // (low 6 bits) and leading-zero ranks (next 32 bits), exact
    // power-of-two Σ so the estimate is bit-identical cross-engine
    "hll_gram_cardinality" -> {
      val bitlen = (32 to 1 by -1)
        .map(k => s"WHEN r2 >= ${1L << (k - 1)} THEN $k").mkString(" ")
      s"""WITH wrd AS (SELECT source, $WordsSql AS ws FROM documents),
         |gl AS (SELECT source, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-2), i -> array_to_string(list_slice(ws, i, i+2), ' ')) END AS garr FROM wrd WHERE len(ws) > 0),
         |g AS (SELECT source, unnest(garr) AS gram FROM gl),
         |hb AS (SELECT source, gram, ${md5LongSql("concat('hll:', gram)")} AS h FROM g),
         |rr AS (SELECT source, gram, h % 64 AS register, (h >> 6) % 4294967296 AS r2 FROM hb),
         |rh AS (SELECT source, register, 33 - (CASE $bitlen ELSE 0 END) AS rho FROM rr),
         |regs AS (SELECT source, register, max(rho) AS mj FROM rh GROUP BY 1, 2),
         |e1 AS (SELECT source, count(*) AS n_registers,
         |  sum(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << mj)) AS s_used FROM regs GROUP BY 1),
         |ex AS (SELECT source, count(DISTINCT gram) AS exact_distinct FROM g GROUP BY 1)
         |SELECT e1.source, n_registers,
         |  round(CAST(0.709 AS DOUBLE) * 4096 / (s_used + (64 - n_registers)), 4) AS est_distinct,
         |  exact_distinct
         |FROM e1 JOIN ex ON e1.source = ex.source ORDER BY e1.source""".stripMargin
    },

    // mirrors TextAnalysis.cmsHeavyHitters: d=4 x w=256 md5 counter
    // grid, estimate = min over the word's four cells, top-20 by exact
    // count (word tie-break) measured against its own sketch
    "cms_heavy_hitters" ->
      s"""WITH wrd AS (SELECT $WordsSql AS ws FROM documents),
         |tok AS (SELECT unnest(ws) AS w FROM wrd),
         |ex AS (SELECT w, count(*) AS exact_count FROM tok GROUP BY 1),
         |top AS (SELECT * FROM ex ORDER BY exact_count DESC, w LIMIT 20),
         |hs AS (SELECT w, r.i,
         |  ${md5LongSql("concat('cm', CAST(r.i AS VARCHAR), ':', w)")} % 256 AS bucket
         |  FROM tok CROSS JOIN range(4) r(i)),
         |c AS (SELECT i, bucket, count(*) AS cell FROM hs GROUP BY 1, 2),
         |tb AS (SELECT DISTINCT t.w, t.exact_count, h.i, h.bucket
         |  FROM top t JOIN hs h USING (w)),
         |est AS (SELECT w, exact_count, min(cell) AS cms_estimate
         |  FROM tb JOIN c USING (i, bucket) GROUP BY 1, 2)
         |SELECT w AS word, exact_count, cms_estimate,
         |  cms_estimate - exact_count AS overcount
         |FROM est ORDER BY exact_count DESC, word""".stripMargin,

    // mirrors Similarity.knnLabelPropagation: same auto-sized sign
    // buckets, 5 nearest labeled neighbors per held-out vector
    // (rounded-cosine order, nid tie-break), majority vote with
    // smallest-label tie-break
    "knn_label_propagation" ->
      s"""WITH $EmbAutoBucketCte,
         |u AS (SELECT vec_id, label AS true_label, v, bkt FROM bkt WHERE vec_id % 5 = 0),
         |l AS (SELECT vec_id AS nid, label AS nlabel, v AS nv, bkt FROM bkt WHERE vec_id % 5 <> 0),
         |nn AS (SELECT u.vec_id, u.true_label, l.nid, l.nlabel,
         |  row_number() OVER (PARTITION BY u.vec_id
         |    ORDER BY round(list_cosine_similarity(u.v, l.nv), 6) DESC, l.nid) AS rn
         |  FROM u JOIN l ON u.bkt = l.bkt),
         |vt AS (SELECT vec_id, true_label, nlabel, count(*) AS votes FROM nn WHERE rn <= 5 GROUP BY 1, 2, 3),
         |wv AS (SELECT vec_id, true_label, nlabel, votes,
         |  CAST(sum(votes) OVER (PARTITION BY vec_id) AS BIGINT) AS k_used,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY votes DESC, nlabel) AS wr FROM vt)
         |SELECT vec_id, nlabel AS pred_label, votes, k_used, true_label
         |FROM wv WHERE wr = 1 ORDER BY vec_id""".stripMargin,

    // mirrors TextDedup.ngramDuplicationProfile: distinct per-doc
    // 3-grams -> document frequency -> 4-bucket duplication panel
    "ngram_dup_profile" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |gl AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-2), i -> array_to_string(list_slice(ws, i, i+2), ' ')) END AS garr FROM wrd WHERE len(ws) > 0),
         |g AS (SELECT DISTINCT doc_id, unnest(garr) AS gram FROM gl),
         |f AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
         |b AS (SELECT CASE WHEN df = 1 THEN '1_unique' WHEN df <= 5 THEN '2_2-5'
         |  WHEN df <= 10 THEN '3_6-10' ELSE '4_11plus' END AS dup_bucket, df FROM f)
         |SELECT dup_bucket, count(*) AS n_grams, CAST(sum(df) AS BIGINT) AS n_occurrences,
         |  round(count(*) / sum(count(*)) OVER (), 6) AS share
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // mirrors TextDedup.memorizationRisk: doc-level df=1 share with
    // the portable round-6 integer ratio
    "memorization_risk" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |gl AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-2), i -> array_to_string(list_slice(ws, i, i+2), ' ')) END AS garr FROM wrd WHERE len(ws) > 0),
         |g AS (SELECT DISTINCT doc_id, unnest(garr) AS gram FROM gl),
         |f AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
         |pd AS (SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
         |  FROM g JOIN f USING (gram) GROUP BY 1)
         |SELECT doc_id, n_grams, n_unique,
         |  floor(CAST(n_unique AS DOUBLE) / n_grams * 1000000.0 + 0.5) / 1000000.0 AS unique_share6
         |FROM pd ORDER BY doc_id""".stripMargin,

    // semantic dedup = components over the verified cosine pairs, same
    // cluster contract as the text families
    "semantic_clusters" ->
      s"""WITH RECURSIVE $EmbAutoBucketCte,
         |sem AS (SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
         |  FROM bkt x JOIN bkt y ON x.bkt = y.bkt AND x.vec_id < y.vec_id
         |  WHERE round(list_cosine_similarity(x.v, y.v), 6) >= 0.35),
         |${docComponentsSql("sem")}""".stripMargin,

    // mirrors Similarity.embeddingOutliers: exact-decimal centroid
    // means, list_cosine_similarity (== CosineSimilarityExpr), round-6
    // decimal cosines, price_jumps band arithmetic
    "embedding_outliers" -> {
      val cents = (0 until 64).map(i =>
        s"CAST(sum(CAST(v[${i + 1}] AS DECIMAL(27,12))) AS DOUBLE) / count(*) AS c$i")
        .mkString(", ")
      val clist = (0 until 64).map(i => s"c$i").mkString("list_value(", ", ", ")")
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ct AS (SELECT label, $cents FROM e GROUP BY label),
         |sc AS (SELECT e.vec_id, e.label,
         |  CAST(round(list_cosine_similarity(e.v, $clist), 6) AS DECIMAL(18,6)) AS cos6
         |  FROM e JOIN ct USING (label)),
         |st AS (SELECT label, count(*) AS n, sum(cos6) AS s1, sum(cos6 * cos6) AS s2 FROM sc GROUP BY 1),
         |jo AS (SELECT sc.vec_id, sc.label, sc.cos6, CAST(s1 AS DOUBLE) / n AS mean,
         |  sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sdev
         |  FROM sc JOIN st USING (label))
         |SELECT vec_id, label, CAST(cos6 AS DOUBLE) AS cos_to_centroid,
         |  round((mean - CAST(cos6 AS DOUBLE)) / sdev, 4) AS z
         |FROM jo WHERE CAST(cos6 AS DOUBLE) < mean - CAST(3.0 AS DOUBLE) * sdev
         |ORDER BY vec_id""".stripMargin
    },

    "label_centroids" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT label, count(*) AS n, $centroidCols FROM e GROUP BY label ORDER BY label""".stripMargin,

    "text_lang_stats" ->
      s"""SELECT lang, count(*) AS n_docs, round(avg(n_chars),4) AS avg_chars,
         |min(n_chars) AS min_chars, max(n_chars) AS max_chars, round(avg(n_words),4) AS avg_words
         |FROM (SELECT lang, n_chars, CAST(len($WordsSql) AS BIGINT) AS n_words FROM documents)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "text_quality" ->
      s"""WITH b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_actual,
         |  CAST(len($WordsSql) AS BIGINT) AS n_words,
         |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len($WordsSql), 4) AS avg_word_len,
         |  round(CAST(len(list_filter($WordsSql, x -> list_contains(['the','a','of','and','or','in','to'], x))) AS DOUBLE) / len($WordsSql), 4) AS stopword_ratio,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio
         |  FROM documents)
         |SELECT doc_id, n_chars_actual, n_words, avg_word_len, stopword_ratio, punct_ratio,
         |  round(least(CAST(1.0 AS DOUBLE), n_words / 50.0) * (CAST(1.0 AS DOUBLE) - punct_ratio), 4) AS quality_score
         |FROM b ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |bgl AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN []
         |    ELSE list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) END AS bgs
         |  FROM w),
         |bg AS (SELECT doc_id, unnest(bgs) AS bg FROM bgl),
         |cnt AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
         |per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_c,
         |  CAST(count(*) AS BIGINT) AS n_distinct FROM cnt GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(p.n_bigrams, 0) AS n_bigrams,
         |  round(coalesce(CAST(p.top_c AS DOUBLE) / p.n_bigrams, 0.0), 4) AS top_bigram_frac,
         |  round(coalesce(CAST(p.n_distinct AS DOUBLE) / p.n_bigrams, 1.0), 4) AS distinct_bigram_ratio
         |FROM documents d LEFT JOIN per p USING (doc_id) ORDER BY doc_id""".stripMargin,

    // same patterns, same replacement order as TextAnalysis.redactOf
    // (email -> ip -> phone); DuckDB needs the 'g' flag for global
    // replace where Spark's regexp_replace is global by default
    "text_redact" ->
      """WITH b AS (SELECT doc_id, lower(text) AS t FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(t, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS redacted,
        |  CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g')) AS BIGINT) AS redacted_chars
        |FROM b ORDER BY doc_id""".stripMargin,

    "text_lang_id" ->
      s"""WITH b AS (SELECT doc_id, lang, list_distinct($WordsSql) AS ws FROM documents),
         |s AS (SELECT doc_id, lang,
         |  CAST(len(list_intersect(ws, ['der','die','das','und','ist'])) AS BIGINT) AS score_de,
         |  CAST(len(list_intersect(ws, ['the','a','of','and','is'])) AS BIGINT) AS score_en,
         |  CAST(len(list_intersect(ws, ['el','la','de','y','es'])) AS BIGINT) AS score_es,
         |  CAST(len(list_intersect(ws, ['le','la','de','et','est'])) AS BIGINT) AS score_fr FROM b)
         |SELECT doc_id, lang,
         |  CASE WHEN score_de = greatest(score_de, score_en, score_es, score_fr) AND score_de > 0 THEN 'de'
         |       WHEN score_en = greatest(score_de, score_en, score_es, score_fr) AND score_en > 0 THEN 'en'
         |       WHEN score_es = greatest(score_de, score_en, score_es, score_fr) AND score_es > 0 THEN 'es'
         |       WHEN score_fr = greatest(score_de, score_en, score_es, score_fr) AND score_fr > 0 THEN 'fr'
         |       ELSE 'und' END AS predicted_lang,
         |  score_de, score_en, score_es, score_fr FROM s ORDER BY doc_id""".stripMargin,

    "text_token_counts" ->
      s"""SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS ws_tokens,
         |CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe_ish_tokens,
         |CAST(length(text) AS BIGINT) AS n_chars_actual FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprints" ->
      s"""WITH wrd AS (SELECT doc_id, text, $WordsSql AS ws FROM documents),
         |shl AS (SELECT doc_id, text, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-2), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS sharr FROM wrd)
         |SELECT doc_id, md5(lower(text)) AS fp_md5, ${md5LongSql("lower(text)")} AS fp_int,
         |  list_min(list_transform(sharr, s -> ${md5LongSql("s")} % 2147483647)) AS min_shingle_hash
         |FROM shl ORDER BY doc_id""".stripMargin,

    "inactive_tokens" ->
      """SELECT c_custkey FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM events WHERE user_id = c_custkey
        |  AND ts >= TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 7 DAY)
        |ORDER BY c_custkey""".stripMargin,

    "pivot_counts" ->
      """SELECT user_id,
        |count(*) FILTER (WHERE event_type = 'click') AS click,
        |count(*) FILTER (WHERE event_type = 'error') AS error,
        |count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events WHERE user_id IN (1,7,42,99) GROUP BY user_id ORDER BY user_id""".stripMargin,

    "tokens_by_type" ->
      """SELECT event_type,
        |array_to_string(list_sort(list(DISTINCT user_id)), ',') AS token_list,
        |count(DISTINCT user_id) AS n_tokens
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "session_stats" ->
      """WITH f AS (SELECT * FROM events WHERE user_id IN (1,7,42,99)),
        |l AS (SELECT *, CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 14400000000
        |  THEN 1 ELSE 0 END AS new_session FROM f),
        |s AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM l)
        |SELECT user_id, session_id, count(*) AS n_events, epoch_us(min(ts)) AS session_start_us,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    // session_window boundary rule (pinned by the BarsSpec fixture):
    // [ts, ts+gap] merges INCLUSIVELY — diff == gap extends, diff > gap
    // splits (the same predicate as session_stats) — and a session's
    // end is its last event's ts + gap
    "session_window_agg" ->
      """WITH f AS (SELECT * FROM events WHERE user_id IN (1,7,42,99)),
        |l AS (SELECT *, CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 14400000000
        |  THEN 1 ELSE 0 END AS new_session FROM f),
        |s AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM l)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        |  epoch_us(max(ts)) + 14400000000 AS session_end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_start_us""".stripMargin,

    "percentiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
        |round(quantile_cont(value, 0.9), 4) AS p90, round(quantile_cont(value, 0.99), 4) AS p99,
        |count(*) AS tick_count FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // mirrors ops.QuantileSketch.quantileSketch: data-derived per-group
    // [lo, hi) domain, 256-bucket clamp(floor((v-lo)/width)) histogram,
    // estimate = upper edge of the first bucket whose cumulative count
    // reaches ceil(q*n) (portable round 6), exact legs = the proven
    // percentiles formulation. All double literals cast explicitly —
    // DuckDB decimal-literal trap (ORACLE.md).
    "quantile_sketch" ->
      """WITH mm AS (SELECT event_type, min(value) AS lo, max(value) AS hi,
        |    count(*) AS n FROM events GROUP BY 1),
        |mw AS (SELECT event_type, lo, hi, n,
        |  CASE WHEN (hi - lo) / CAST(256.0 AS DOUBLE) = CAST(0.0 AS DOUBLE)
        |    THEN CAST(1.0 AS DOUBLE) ELSE (hi - lo) / CAST(256.0 AS DOUBLE) END AS width
        |  FROM mm),
        |bk AS (SELECT e.event_type,
        |  least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
        |    CAST(floor((e.value - m.lo) / m.width) AS BIGINT))) AS bucket
        |  FROM events e JOIN mw m USING (event_type)),
        |cl AS (SELECT event_type, bucket, count(*) AS cell FROM bk GROUP BY 1, 2),
        |cm AS (SELECT event_type, bucket, CAST(sum(cell) OVER (
        |    PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum FROM cl),
        |eb AS (SELECT c.event_type,
        |  min(CASE WHEN c.cum >= CAST(ceil(CAST(0.5 AS DOUBLE) * m.n) AS BIGINT) THEN c.bucket END) AS b_p50,
        |  min(CASE WHEN c.cum >= CAST(ceil(CAST(0.9 AS DOUBLE) * m.n) AS BIGINT) THEN c.bucket END) AS b_p90,
        |  min(CASE WHEN c.cum >= CAST(ceil(CAST(0.99 AS DOUBLE) * m.n) AS BIGINT) THEN c.bucket END) AS b_p99
        |  FROM cm c JOIN mw m USING (event_type) GROUP BY 1),
        |ex AS (SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(value, 0.9), 4) AS p90_exact,
        |  round(quantile_cont(value, 0.99), 4) AS p99_exact FROM events GROUP BY 1)
        |SELECT m.event_type, m.n AS tick_count,
        |  floor((m.lo + (b.b_p50 + 1) * m.width) * 1000000.0 + 0.5) / 1000000.0 AS p50_est, x.p50_exact,
        |  floor((m.lo + (b.b_p90 + 1) * m.width) * 1000000.0 + 0.5) / 1000000.0 AS p90_est, x.p90_exact,
        |  floor((m.lo + (b.b_p99 + 1) * m.width) * 1000000.0 + 0.5) / 1000000.0 AS p99_est, x.p99_exact
        |FROM mw m JOIN eb b USING (event_type) JOIN ex x USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // mirrors ops.QuantileSketch.quantileSketchAdaptive: the log-bucket
    // key recomputed with EXACT IEEE arithmetic — the power-of-two table
    // comes from a doubling/halving recursive CTE (products by 2.0/0.5
    // are exact), the octave from a p <= v < 2p join, the subbucket from
    // a power-of-two division (exact) — no transcendental log anywhere,
    // so every key matches plans.Log2BucketExpr bit-for-bit. Corpus
    // values are strictly positive; the sign mirror and saturation arms
    // are Spark-side contract pinned by QuantileSketchSpec.
    "quantile_sketch_adaptive" ->
      """WITH RECURSIVE pup(e, p) AS (
        |  SELECT 0, CAST(1.0 AS DOUBLE)
        |  UNION ALL SELECT e + 1, p * CAST(2.0 AS DOUBLE) FROM pup WHERE e < 64),
        |pdn(e, p) AS (
        |  SELECT 0, CAST(1.0 AS DOUBLE)
        |  UNION ALL SELECT e - 1, p * CAST(0.5 AS DOUBLE) FROM pdn WHERE e > -64),
        |pw AS (SELECT e, p FROM pup UNION ALL SELECT e, p FROM pdn WHERE e < 0),
        |bk AS (SELECT ev.event_type,
        |  CASE
        |    WHEN ev.value = CAST(0.0 AS DOUBLE) THEN CAST(0 AS BIGINT)
        |    WHEN ev.value < (SELECT p FROM pw WHERE e = -64) THEN CAST(17 AS BIGINT)
        |    WHEN ev.value >= CAST(2.0 AS DOUBLE) * (SELECT p FROM pw WHERE e = 64) THEN CAST(2080 AS BIGINT)
        |    ELSE CAST((w.e + 65) * 16 AS BIGINT) + least(CAST(15 AS BIGINT), greatest(CAST(0 AS BIGINT),
        |      CAST(floor((ev.value / w.p - CAST(1.0 AS DOUBLE)) * CAST(16.0 AS DOUBLE)) AS BIGINT))) + 1
        |  END AS bucket
        |  FROM events ev LEFT JOIN pw w
        |    ON ev.value >= w.p AND ev.value < w.p * CAST(2.0 AS DOUBLE)),
        |cl AS (SELECT event_type, bucket, count(*) AS cell FROM bk GROUP BY 1, 2),
        |cm AS (SELECT event_type, bucket,
        |  CAST(sum(cell) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum,
        |  CAST(sum(cell) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM cl),
        |eb AS (SELECT event_type, n,
        |  min(CASE WHEN cum >= CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT) THEN bucket END) AS b_p50,
        |  min(CASE WHEN cum >= CAST(ceil(CAST(0.9 AS DOUBLE) * n) AS BIGINT) THEN bucket END) AS b_p90,
        |  min(CASE WHEN cum >= CAST(ceil(CAST(0.99 AS DOUBLE) * n) AS BIGINT) THEN bucket END) AS b_p99
        |  FROM cm GROUP BY 1, 2),
        |ex AS (SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(value, 0.9), 4) AS p90_exact,
        |  round(quantile_cont(value, 0.99), 4) AS p99_exact FROM events GROUP BY 1)
        |SELECT b.event_type, b.n AS tick_count,
        |  floor((SELECT w.p FROM pw w WHERE w.e = CAST((b.b_p50 - 1) // 16 AS INTEGER) - 65)
        |    * (CAST(1.0 AS DOUBLE) + (CAST((b.b_p50 - 1) % 16 AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(16.0 AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS p50_est, x.p50_exact,
        |  floor((SELECT w.p FROM pw w WHERE w.e = CAST((b.b_p90 - 1) // 16 AS INTEGER) - 65)
        |    * (CAST(1.0 AS DOUBLE) + (CAST((b.b_p90 - 1) % 16 AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(16.0 AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS p90_est, x.p90_exact,
        |  floor((SELECT w.p FROM pw w WHERE w.e = CAST((b.b_p99 - 1) // 16 AS INTEGER) - 65)
        |    * (CAST(1.0 AS DOUBLE) + (CAST((b.b_p99 - 1) % 16 AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(16.0 AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS p99_est, x.p99_exact
        |FROM eb b JOIN ex x USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "stratified_sample" ->
      s"""SELECT lang, count(*) AS n_sampled FROM documents
         |WHERE ${md5LongSql("lower(text)")} % 10 = 0 GROUP BY lang ORDER BY lang""".stripMargin,

    "token_histogram" ->
      s"""SELECT (CAST(len($WordsSql) AS BIGINT) // 10) * 10 AS bucket_lo, count(*) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY bucket_lo""".stripMargin,

    // mirrors TextAnalysis.unigramSurprisal: add-one unigram surprisal,
    // explicit DOUBLE casts so both engines do pure double arithmetic,
    // per-token round→DECIMAL(18,6) makes the doc sum order-free exact;
    // N and V re-derived from the same corpus by each engine
    "text_perplexity" ->
      s"""WITH t AS (SELECT doc_id, unnest($WordsSql) AS w FROM documents),
         |lex AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
         |st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM lex),
         |sc AS (SELECT doc_id, CAST(round(-ln((CAST(c AS DOUBLE) + 1.0) / CAST(n + v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS s
         |  FROM t JOIN lex USING (w) CROSS JOIN st),
         |ds AS (SELECT doc_id, count(*) AS n_words, sum(s) AS nll FROM sc GROUP BY 1)
         |SELECT doc_id, n_words, CAST(nll AS DOUBLE) AS nll_sum,
         |  CAST(nll AS DOUBLE) / n_words AS nll_avg FROM ds ORDER BY doc_id""".stripMargin,

    // mirrors TextAnalysis.lengthBuckets: descending-priority CASE =
    // the Scala fold (largest matching power of two wins)
    "length_buckets" -> {
      val chain = (24 to 1 by -1)
        .map(k => s"WHEN n_words > ${1L << (k - 1)} THEN ${1L << k}").mkString(" ")
      s"""WITH w AS (SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS n_words FROM documents),
         |b AS (SELECT doc_id, n_words, CAST(CASE $chain ELSE 1 END AS BIGINT) AS bucket FROM w WHERE n_words > 0),
         |g AS (SELECT bucket, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS word_mass FROM b GROUP BY 1)
         |SELECT bucket, n_docs, word_mass, bucket * n_docs AS padded_mass,
         |  round((bucket * n_docs - word_mass) / (bucket * n_docs), 6) AS waste_share
         |FROM g ORDER BY bucket""".stripMargin
    },

    // mirrors TextAnalysis.charsetStats (regexp_replace needs the 'g'
    // flag in DuckDB; length() counts code points in both engines)
    "charset_stats" ->
      """WITH c AS (SELECT source, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS BIGINT) AS non_ascii,
        |  CAST(length(text) - length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS BIGINT) AS control_chars,
        |  CAST(length(text) - length(regexp_replace(text, '�', '', 'g')) AS BIGINT) AS replacement_chars
        |  FROM documents),
        |g AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars, CAST(sum(non_ascii) AS BIGINT) AS non_ascii,
        |  CAST(sum(control_chars) AS BIGINT) AS control_chars, CAST(sum(replacement_chars) AS BIGINT) AS replacement_chars
        |  FROM c GROUP BY 1)
        |SELECT source, n_chars, non_ascii, control_chars, replacement_chars,
        |  round(CAST(non_ascii AS DOUBLE) / n_chars, 4) AS non_ascii_share
        |FROM g ORDER BY source""".stripMargin,

    // mirrors TextAnalysis.domainReweight: round-6 per-doc difficulty,
    // re-rounded per-source mean, exact cross-source decimal total
    "domain_reweight" ->
      s"""WITH t AS (SELECT doc_id, unnest($WordsSql) AS w FROM documents),
         |lex AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
         |st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM lex),
         |sc AS (SELECT doc_id, CAST(round(-ln((CAST(c AS DOUBLE) + 1.0) / CAST(n + v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS s
         |  FROM t JOIN lex USING (w) CROSS JOIN st),
         |ds AS (SELECT doc_id, count(*) AS n_words, sum(s) AS nll FROM sc GROUP BY 1),
         |davg AS (SELECT doc_id, CAST(floor(CAST(nll AS DOUBLE) / n_words * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS d6 FROM ds),
         |ps AS (SELECT d.source, count(*) AS n_docs, sum(v.d6) AS sd
         |  FROM davg v JOIN documents d USING (doc_id) GROUP BY 1),
         |m AS (SELECT source, n_docs, CAST(floor(CAST(sd AS DOUBLE) / n_docs * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS mean6 FROM ps),
         |tt AS (SELECT sum(mean6) AS t6 FROM m)
         |SELECT source, n_docs, CAST(mean6 AS DOUBLE) AS mean_difficulty,
         |  round(CAST(mean6 AS DOUBLE) / CAST(t6 AS DOUBLE), 6) AS weight,
         |  CAST(floor(CAST(mean6 AS DOUBLE) / CAST(t6 AS DOUBLE) * 1000) AS BIGINT) AS quota
         |FROM m CROSS JOIN tt ORDER BY source""".stripMargin,

    // mirrors TextAnalysis.corpusDrift: doc-parity halves, add-one
    // smoothing over the union vocab, round-6 decimal KL terms
    "corpus_drift" ->
      s"""WITH t AS (SELECT source, doc_id % 2 AS half, unnest($WordsSql) AS w FROM documents),
         |cnt AS (SELECT source, w, sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
         |  sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb FROM t GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb, count(*) AS v FROM cnt GROUP BY 1),
         |p AS (SELECT cnt.source,
         |  (CAST(ca AS DOUBLE) + 1.0) / CAST(na + v AS DOUBLE) AS pa,
         |  (CAST(cb AS DOUBLE) + 1.0) / CAST(nb + v AS DOUBLE) AS pb
         |  FROM cnt JOIN tot USING (source)),
         |tm AS (SELECT source, CAST(round(pa * ln(pa / pb), 6) AS DECIMAL(18,6)) AS tab,
         |  CAST(round(pb * ln(pb / pa), 6) AS DECIMAL(18,6)) AS tba FROM p),
         |k AS (SELECT source, sum(tab) AS ka, sum(tba) AS kb FROM tm GROUP BY 1)
         |SELECT source, v AS vocab, CAST(ka AS DOUBLE) AS kl_ab, CAST(kb AS DOUBLE) AS kl_ba
         |FROM k JOIN tot USING (source) ORDER BY source""".stripMargin,

    // mirrors TextAnalysis.corpusDriftDeciles: arithmetic doc_id-range
    // deciles, full union vocab per decile (missing words carry their
    // add-one mass), round-6 decimal KL terms
    "corpus_drift_deciles" ->
      s"""WITH toks AS (SELECT doc_id, unnest($WordsSql) AS w FROM documents),
         |mx AS (SELECT max(doc_id) AS mx FROM toks),
         |t AS (SELECT (doc_id * 10) // (mx + 1) AS dec, w FROM toks CROSS JOIN mx),
         |cw AS (SELECT dec, w, count(*) AS cdw FROM t GROUP BY 1, 2),
         |gw AS (SELECT w, count(*) AS cw FROM t GROUP BY 1),
         |nd AS (SELECT dec, CAST(sum(cdw) AS BIGINT) AS ndec FROM cw GROUP BY 1),
         |vn AS (SELECT count(*) AS v, CAST(sum(cw) AS BIGINT) AS n FROM gw),
         |ds AS (SELECT unnest(generate_series(0, 9)) AS dec),
         |fl AS (SELECT ds.dec, gw.w, gw.cw, coalesce(cw.cdw, 0) AS cdw
         |  FROM gw CROSS JOIN ds LEFT JOIN cw ON cw.dec = ds.dec AND cw.w = gw.w),
         |p AS (SELECT fl.dec,
         |  (CAST(cdw AS DOUBLE) + 1.0) / CAST(ndec + v AS DOUBLE) AS pd,
         |  (CAST(cw AS DOUBLE) + 1.0) / CAST(n + v AS DOUBLE) AS pc, ndec
         |  FROM fl JOIN nd ON nd.dec = fl.dec CROSS JOIN vn),
         |tm AS (SELECT dec, ndec, CAST(round(pd * ln(pd / pc), 6) AS DECIMAL(18,6)) AS t6 FROM p)
         |SELECT dec, min(ndec) AS n_tokens, CAST(sum(t6) AS DOUBLE) AS kl_to_corpus
         |FROM tm GROUP BY 1 ORDER BY 1""".stripMargin,

    // mirrors TextAnalysis.bpeFertility: same 10-merge training chain,
    // per-word symbol counts regrouped by source
    "bpe_fertility" ->
      s"""WITH RECURSIVE ${bpeTrainCtes(10)},
         |u AS (SELECT d.source, unnest(w.ws) AS word FROM wrd w JOIN documents d USING (doc_id)),
         |pw AS (SELECT word, CAST(len(syms) AS BIGINT) AS wt FROM vz10),
         |t AS (SELECT source, count(*) AS n_words, CAST(sum(wt) AS BIGINT) AS n_tokens
         |  FROM u JOIN pw USING (word) GROUP BY 1)
         |SELECT source, n_words, n_tokens,
         |  round(CAST(n_tokens AS DOUBLE) / n_words, 6) AS fertility
         |FROM t ORDER BY source""".stripMargin,

    // mirrors TextAnalysis.curriculumAssign: same unigram-surprisal
    // difficulty (round-6 decimal), z-score bands from exact decimal
    // sums, md5 shards — no rank/ntile anywhere
    "curriculum_assign" ->
      s"""WITH t AS (SELECT doc_id, unnest($WordsSql) AS w FROM documents),
         |lex AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
         |st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM lex),
         |sc AS (SELECT doc_id, CAST(round(-ln((CAST(c AS DOUBLE) + 1.0) / CAST(n + v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS s
         |  FROM t JOIN lex USING (w) CROSS JOIN st),
         |ds AS (SELECT doc_id, count(*) AS n_words, sum(s) AS nll FROM sc GROUP BY 1),
         |davg AS (SELECT doc_id, CAST(floor(CAST(nll AS DOUBLE) / n_words * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS d6 FROM ds),
         |stats AS (SELECT count(*) AS n, sum(d6) AS sd, sum(d6 * d6) AS sd2 FROM davg),
         |j AS (SELECT doc_id, CAST(d6 AS DOUBLE) AS difficulty,
         |  CAST(sd AS DOUBLE) / n AS mean, CAST(sd2 AS DOUBLE) / n AS ex2 FROM davg CROSS JOIN stats)
         |SELECT doc_id, difficulty,
         |  CASE WHEN difficulty < mean - sqrt(ex2 - mean * mean) THEN 1
         |       WHEN difficulty < mean THEN 2
         |       WHEN difficulty < mean + sqrt(ex2 - mean * mean) THEN 3
         |       ELSE 4 END AS phase,
         |  CAST(${md5LongSql("'cur:' || doc_id")} % 16 AS INTEGER) AS shard
         |FROM j ORDER BY doc_id""".stripMargin,

    // mirrors TextAnalysis.tokenEntropy: round-6 decimal -p ln p terms,
    // exact decimal per-source sums
    "token_entropy" ->
      s"""WITH t AS (SELECT source, unnest($WordsSql) AS w FROM documents),
         |cnt AS (SELECT source, w, count(*) AS c FROM t GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n, count(*) AS vocab, max(c) AS cmax FROM cnt GROUP BY 1),
         |tm AS (SELECT source, CAST(round(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 6) AS DECIMAL(18,6)) AS term
         |  FROM cnt JOIN tot USING (source)),
         |e AS (SELECT source, sum(term) AS ent FROM tm GROUP BY 1)
         |SELECT source, n AS n_tokens, vocab, CAST(ent AS DOUBLE) AS entropy_nats,
         |  round(CAST(cmax AS DOUBLE) / n, 6) AS top_share
         |FROM e JOIN tot USING (source) ORDER BY source""".stripMargin,

    // mirrors TextAnalysis.tfidfKeywords: tf x portable-round-6 idf as
    // exact decimals (the product and the ordering cannot drift);
    // row_number is BIGINT in DuckDB -> CAST AS INT per the playbook
    "tfidf_keywords" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS w FROM wrd),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
         |sc AS (SELECT doc_id, w,
         |  CAST(CAST(tf AS DECIMAL(12,0)) * CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS score
         |  FROM tf JOIN dfreq USING (w) CROSS JOIN nd
         |  WHERE doc_id % 100 = 0),
         |r AS (SELECT doc_id, w, score,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rk FROM sc)
         |SELECT doc_id, CAST(rk AS INT) AS rk, w AS word, CAST(score AS DOUBLE) AS score
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // mirrors TextAnalysis.pmiCollocations: identical single-ln
    // integer-ratio expression, portable round-6 (feeds the ordering)
    "pmi_collocations" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |wnz AS (SELECT ws FROM wrd WHERE len(ws) > 0),
         |ut AS (SELECT unnest(ws) AS w FROM wnz),
         |uc AS (SELECT w, count(*) AS c FROM ut GROUP BY 1),
         |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uc),
         |bgl AS (SELECT CASE WHEN len(ws) < 2 THEN []
         |  ELSE list_transform(generate_series(1, len(ws)-1), i -> [ws[i], ws[i+1]]) END AS bgs FROM wnz),
         |be AS (SELECT unnest(bgs) AS bg FROM bgl),
         |bc AS (SELECT bg[1] AS pw, bg[2] AS w, count(*) AS cbg FROM be GROUP BY 1, 2),
         |nb AS (SELECT CAST(sum(cbg) AS BIGINT) AS n_bigrams FROM bc),
         |sc AS (SELECT bc.pw, bc.w, bc.cbg,
         |  floor(ln((CAST(bc.cbg AS DOUBLE) * n_tokens * n_tokens) /
         |           (CAST(n_bigrams AS DOUBLE) * ua.c * ub.c)) * 1000000.0 + 0.5) / 1000000.0 AS pmi
         |  FROM bc JOIN uc ua ON ua.w = bc.pw JOIN uc ub ON ub.w = bc.w
         |  CROSS JOIN nt CROSS JOIN nb
         |  WHERE bc.cbg >= 5)
         |SELECT pw AS word_a, w AS word_b, cbg AS n_pair, pmi
         |FROM sc ORDER BY pmi DESC, word_a, word_b LIMIT 20""".stripMargin,

    // mirrors Mixing.rendezvousShards: argmax-of-k-md5 assignment for
    // k=16 and 17 (h desc, shard asc), per-old-shard movement audit
    "rendezvous_shards" -> {
      def assign(k: Int, name: String) =
        s"""$name AS (SELECT doc_id, s FROM (
           |  SELECT d.doc_id, r.s, row_number() OVER (PARTITION BY d.doc_id
           |    ORDER BY ${md5LongSql("concat('rdv:', CAST(r.s AS VARCHAR), ':', CAST(d.doc_id AS VARCHAR))")} DESC, r.s) AS rk
           |  FROM (SELECT doc_id FROM documents) d
           |  CROSS JOIN (SELECT unnest(generate_series(0, ${k - 1})) AS s) r) t
           |  WHERE rk = 1)""".stripMargin
      s"""WITH ${assign(16, "o16")},
         |${assign(17, "o17")},
         |jj AS (SELECT o16.doc_id, o16.s AS s_old, o17.s AS s_new
         |  FROM o16 JOIN o17 USING (doc_id)),
         |gg AS (SELECT s_old AS shard, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
         |  FROM jj GROUP BY 1)
         |SELECT shard, n_docs, n_moved,
         |  floor(CAST(n_moved AS DOUBLE) / n_docs * 1000000.0 + 0.5) / 1000000.0 AS moved_share6
         |FROM gg ORDER BY shard""".stripMargin
    },

    // mirrors TextAnalysis.distinctNgramDiversity: short-doc whole-text
    // gram convention per n, portable-round-6 integer-ratio share
    "distinct_ngram_diversity" ->
      s"""WITH wrd AS (SELECT source, $WordsSql AS ws FROM documents),
         |wnz AS (SELECT source, ws FROM wrd WHERE len(ws) > 0),
         |g1 AS (SELECT source, unnest(ws) AS gram FROM wnz),
         |d1 AS (SELECT source, 1 AS n, count(*) AS n_total, count(DISTINCT gram) AS n_distinct FROM g1 GROUP BY 1),
         |gl2 AS (SELECT source, CASE WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-1), i -> array_to_string(list_slice(ws, i, i+1), ' ')) END AS garr FROM wnz),
         |g2 AS (SELECT source, unnest(garr) AS gram FROM gl2),
         |d2 AS (SELECT source, 2 AS n, count(*) AS n_total, count(DISTINCT gram) AS n_distinct FROM g2 GROUP BY 1),
         |gl3 AS (SELECT source, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-2), i -> array_to_string(list_slice(ws, i, i+2), ' ')) END AS garr FROM wnz),
         |g3 AS (SELECT source, unnest(garr) AS gram FROM gl3),
         |d3 AS (SELECT source, 3 AS n, count(*) AS n_total, count(DISTINCT gram) AS n_distinct FROM g3 GROUP BY 1),
         |u AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
         |SELECT source, n, n_total, n_distinct,
         |  floor(CAST(n_distinct AS DOUBLE) / n_total * 1000000.0 + 0.5) / 1000000.0 AS distinct_share
         |FROM u ORDER BY source, n""".stripMargin,

    // mirrors TextAnalysis.qualityRules: same rounded metrics as
    // text_quality/text_repetition, CASE over the identical comparisons
    "quality_rules" ->
      s"""WITH w AS (SELECT doc_id, $WordsSql AS ws, text FROM documents),
         |q AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(ws), 4) AS awl,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS pr,
         |  CAST(len(list_distinct(list_filter(ws, x -> list_contains(['the','a','of','and','or','in','to'], x)))) AS BIGINT) AS nsw
         |  FROM w),
         |bgl AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN []
         |    ELSE list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) END AS bgs FROM w),
         |be AS (SELECT doc_id, unnest(bgs) AS bg FROM bgl),
         |bc AS (SELECT doc_id, bg, count(*) AS c FROM be GROUP BY 1, 2),
         |per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, max(c) AS tc FROM bc GROUP BY 1),
         |rp AS (SELECT d.doc_id, round(coalesce(CAST(p.tc AS DOUBLE) / p.nb, 0.0), 4) AS tbf
         |  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN per p USING (doc_id)),
         |f AS (SELECT q.doc_id, q.n_words,
         |  CASE WHEN q.n_words >= 50 AND q.n_words <= 100000 THEN 1 ELSE 0 END AS r_word_count,
         |  CASE WHEN q.awl >= 3.0 AND q.awl <= 10.0 THEN 1 ELSE 0 END AS r_word_len,
         |  CASE WHEN q.pr <= 0.1 THEN 1 ELSE 0 END AS r_symbol,
         |  CASE WHEN q.nsw >= 2 THEN 1 ELSE 0 END AS r_stopwords,
         |  CASE WHEN rp.tbf <= 0.18 THEN 1 ELSE 0 END AS r_repetition
         |  FROM q JOIN rp USING (doc_id))
         |SELECT doc_id, n_words,
         |  CAST(r_word_count AS BIGINT) AS r_word_count,
         |  CAST(r_word_len AS BIGINT) AS r_word_len,
         |  CAST(r_symbol AS BIGINT) AS r_symbol,
         |  CAST(r_stopwords AS BIGINT) AS r_stopwords,
         |  CAST(r_repetition AS BIGINT) AS r_repetition,
         |  CAST(r_word_count * r_word_len * r_symbol * r_stopwords * r_repetition AS BIGINT) AS pass
         |FROM f ORDER BY doc_id""".stripMargin,

    // mirrors TextAnalysis.datasetCard — composed from the lang-id,
    // quality, minhash-cluster, and decontamination oracle fragments;
    // mean quality as exact DECIMAL(14,4) sum / count (order-free)
    "dataset_card" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")},
         |clus AS (SELECT doc_id, cluster_size FROM allc JOIN rep USING (comp)),
         |dcand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS bench_id FROM bt a
         |  JOIN bt b ON a.band = b.band AND a.band_key = b.band_key
         |  WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0),
         |dest AS (SELECT c.doc_id, c.bench_id,
         |  CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE)/32 AS e
         |  FROM dcand c JOIN mh x ON x.doc_id = c.doc_id
         |  JOIN mh y ON y.doc_id = c.bench_id AND y.i = x.i GROUP BY 1, 2),
         |cont AS (SELECT DISTINCT doc_id FROM dest WHERE e >= 0.2),
         |lsc AS (SELECT doc_id,
         |  CAST(len(list_intersect(dw, ['der','die','das','und','ist'])) AS BIGINT) AS s_de,
         |  CAST(len(list_intersect(dw, ['the','a','of','and','is'])) AS BIGINT) AS s_en,
         |  CAST(len(list_intersect(dw, ['el','la','de','y','es'])) AS BIGINT) AS s_es,
         |  CAST(len(list_intersect(dw, ['le','la','de','et','est'])) AS BIGINT) AS s_fr
         |  FROM (SELECT doc_id, list_distinct(ws) AS dw FROM wrd)),
         |lng AS (SELECT doc_id,
         |  CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr) AND s_de > 0 THEN 'de'
         |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) AND s_en > 0 THEN 'en'
         |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) AND s_es > 0 THEN 'es'
         |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) AND s_fr > 0 THEN 'fr'
         |       ELSE 'und' END AS predicted_lang FROM lsc),
         |qual AS (SELECT d.doc_id, d.source, CAST(len(w.ws) AS BIGINT) AS n_words,
         |  round(least(CAST(1.0 AS DOUBLE), len(w.ws) / 50.0) * (CAST(1.0 AS DOUBLE) -
         |    round(CAST(length(d.text) - length(regexp_replace(d.text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(d.text), 4)), 4) AS quality_score
         |  FROM documents d JOIN wrd w USING (doc_id)),
         |pd AS (SELECT q.doc_id, q.source, q.n_words, q.quality_score, l.predicted_lang,
         |  (c.cluster_size > 1) AS is_dup, (ct.doc_id IS NOT NULL) AS is_cont
         |  FROM qual q JOIN lng l USING (doc_id) JOIN clus c USING (doc_id)
         |  LEFT JOIN cont ct USING (doc_id)),
         |agg AS (SELECT source, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(count(DISTINCT predicted_lang) AS BIGINT) AS n_langs,
         |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
         |  CAST(sum(CASE WHEN is_cont THEN 1 ELSE 0 END) AS BIGINT) AS contaminated_docs,
         |  round(CAST(sum(CAST(quality_score AS DECIMAL(14,4))) AS DOUBLE) / count(*), 6) AS avg_quality
         |  FROM pd GROUP BY source),
         |lcnt AS (SELECT source, predicted_lang, count(*) AS n FROM pd GROUP BY 1, 2),
         |tl AS (SELECT source, predicted_lang AS top_lang FROM (
         |  SELECT source, predicted_lang, row_number() OVER (PARTITION BY source ORDER BY n DESC, predicted_lang) AS rn FROM lcnt) WHERE rn = 1)
         |SELECT a.source, n_docs, n_words, n_langs, top_lang, dup_docs, contaminated_docs, avg_quality
         |FROM agg a JOIN tl USING (source) ORDER BY source""".stripMargin,

    // mirrors TextAnalysis.bigramSurprisal: 0.75/0.25 interpolation
    // (dyadic — exact in both engines), first token unigram-only,
    // round(-ln p, 6) as DECIMAL(18,6) per token, exact decimal doc sums
    "text_perplexity_bigram" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |t AS (SELECT doc_id, u.w, u.pw FROM wrd,
         |  LATERAL unnest(list_transform(range(1, len(ws)+1),
         |    i -> struct_pack(w := ws[i], pw := CASE WHEN i >= 2 THEN ws[i-1] END))) AS x(u)),
         |lex AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
         |st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM lex),
         |bg AS (SELECT pw, w, count(*) AS cbg FROM t WHERE pw IS NOT NULL GROUP BY 1, 2),
         |ctx AS (SELECT pw, CAST(sum(cbg) AS BIGINT) AS cctx FROM bg GROUP BY 1),
         |sc AS (SELECT t.doc_id,
         |  CASE WHEN t.pw IS NULL THEN (CAST(lex.c AS DOUBLE) + 1.0) / CAST(st.n + st.v AS DOUBLE)
         |       ELSE 0.75 * (CAST(bg.cbg AS DOUBLE) / CAST(ctx.cctx AS DOUBLE))
         |            + 0.25 * ((CAST(lex.c AS DOUBLE) + 1.0) / CAST(st.n + st.v AS DOUBLE)) END AS p
         |  FROM t JOIN lex USING (w)
         |  LEFT JOIN bg ON bg.pw = t.pw AND bg.w = t.w
         |  LEFT JOIN ctx ON ctx.pw = t.pw
         |  CROSS JOIN st),
         |ds AS (SELECT doc_id, count(*) AS n_words,
         |  sum(CAST(round(-ln(p), 6) AS DECIMAL(18,6))) AS nll FROM sc GROUP BY 1)
         |SELECT doc_id, n_words, CAST(nll AS DOUBLE) AS nll_sum,
         |  CAST(nll AS DOUBLE) / n_words AS nll_avg FROM ds ORDER BY doc_id""".stripMargin,

    // mirrors Importance.importanceTopK: unigram+bigram features hashed
    // into 4096 buckets, add-one log ratio per bucket rounded to
    // DECIMAL(18,6) (exact order-free doc sums), top-100 raw docs by
    // (w_sum desc, doc_id); totals re-derived in-plan on both sides
    "importance_sample" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |bg AS (SELECT doc_id, list_concat(ws, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) END) AS fs FROM wrd),
         |fb AS (SELECT doc_id, ${md5LongSql("concat('f:', f)")} % 4096 AS b FROM (SELECT doc_id, unnest(fs) AS f FROM bg)),
         |cnt AS (SELECT b, CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |  CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr FROM fb GROUP BY 1),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr FROM cnt),
         |w AS (SELECT b, CAST(round(ln((CAST(ct AS DOUBLE) + 1.0) * (CAST(tr AS DOUBLE) + 4096.0) /
         |  ((CAST(cr AS DOUBLE) + 1.0) * (CAST(tt AS DOUBLE) + 4096.0))), 6) AS DECIMAL(18,6)) AS w FROM cnt CROSS JOIN tot),
         |ds AS (SELECT doc_id, count(*) AS n_feats, sum(w) AS wsum FROM fb JOIN w USING (b)
         |  WHERE doc_id % 7 <> 0 GROUP BY 1)
         |SELECT doc_id, n_feats, CAST(wsum AS DOUBLE) AS w_sum FROM ds
         |ORDER BY w_sum DESC, doc_id LIMIT 100""".stripMargin,

    // mirrors QualityClassifier.classifierScores: the same full-batch GD
    // rounds unrolled as CTEs — weights live on the 10^-6 decimal grid,
    // margins and gradients are exact decimal sums, every double step
    // (sigmoid, lr scale, grid round) is one expression over identical
    // inputs; n re-derived by each engine
    "quality_classifier" ->
      s"""WITH ${qcTrainCtes(3)}
         |SELECT fz.doc_id, CASE WHEN fz.doc_id % 7 = 0 THEN 1 ELSE 0 END AS is_target,
         |  CAST(fz.z AS DOUBLE) AS score
         |FROM fz ORDER BY fz.doc_id""".stripMargin,

    // mirrors TextAnalysis.bpeTopPairs: word-count weighting, substr
    // pair windows, (n desc, pair asc) total order
    "bpe_top_pairs" ->
      s"""WITH w AS (SELECT unnest($WordsSql) AS word FROM documents),
         |wc AS (SELECT word, count(*) AS wcnt FROM w GROUP BY 1),
         |p AS (SELECT unnest(list_transform(generate_series(1, length(word)-1), i -> substr(word, i, 2))) AS pair, wcnt
         |  FROM wc WHERE length(word) >= 2),
         |a AS (SELECT pair, CAST(sum(wcnt) AS BIGINT) AS n FROM p GROUP BY 1)
         |SELECT pair, n FROM a ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // mirrors TextAnalysis.bpeMerges: the same 10 rounds unrolled, each
    // round = pair count over the previous vocab, top-1 by (n desc,
    // pair asc), then a recursive-CTE pointer-walk greedy rewrite —
    // algorithm-independent of the Spark side's array fold. The final
    // SELECT stamps the order-free rewritten-vocab checksum.
    "bpe_merges" ->
      s"""WITH RECURSIVE ${bpeTrainCtes(10)}
         |SELECT merge_rank, pair, n, (SELECT c FROM chk) AS vocab_checksum
         |FROM mg ORDER BY merge_rank""".stripMargin,

    // mirrors TextAnalysis.bpeTokenCounts: same 10 trained rounds, then
    // per-word BPE token counts joined back to every word occurrence;
    // zero-word docs keep a 0 row via the LEFT JOIN
    "token_counts_bpe" ->
      s"""WITH RECURSIVE ${bpeTrainCtes(10)},
         |u AS (SELECT doc_id, unnest(ws) AS word FROM wrd),
         |pw AS (SELECT word, CAST(len(syms) AS BIGINT) AS wt FROM vz10),
         |tc AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS n_tokens FROM u JOIN pw USING (word) GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(tc.n_tokens, 0) AS BIGINT) AS n_tokens
         |FROM documents d LEFT JOIN tc USING (doc_id) ORDER BY doc_id""".stripMargin,

    // full tokenizer encode (mirrors TextAnalysis.bpeEncode: vocab from
    // the same 10-merge training chain, doc_id < 8 encoded; pos = the
    // doc's preceding words' token total + position within the word)
    "bpe_encode" ->
      s"""WITH RECURSIVE ${bpeTrainCtes(10)},
         |dw AS (SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS wpos
         |  FROM wrd WHERE doc_id < 8),
         |wt AS (SELECT dw.doc_id, dw.wpos, v.syms FROM dw JOIN vz10 v USING (word)),
         |ot AS (SELECT doc_id, wpos, syms, coalesce(sum(len(syms)) OVER (
         |    PARTITION BY doc_id ORDER BY wpos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS woff
         |  FROM wt),
         |tok AS (SELECT doc_id, woff + generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS token FROM ot)
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos, token FROM tok
         |ORDER BY doc_id, pos""".stripMargin,

    // mirrors TextAnalysis.chunkDocuments (maxTokens=64, overlap=8,
    // stride=56): Spark slice(ws, start, LENGTH 64) == DuckDB
    // list_slice(ws, start, END start+63), both end-clamped
    "chunk_documents" ->
      s"""WITH wrd AS (SELECT doc_id, $WordsSql AS ws FROM documents),
         |n AS (SELECT doc_id, ws, len(ws) AS n FROM wrd),
         |c AS (SELECT doc_id, ws, greatest(CAST(1 AS BIGINT), CAST(ceil((n - 8) / 56.0) AS BIGINT)) AS n_chunks FROM n),
         |x AS (SELECT doc_id, ws, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx FROM c),
         |y AS (SELECT doc_id, chunk_idx, list_slice(ws, chunk_idx*56 + 1, chunk_idx*56 + 64) AS cw FROM x)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  array_to_string(cw, ' ') AS chunk_text, CAST(len(cw) AS BIGINT) AS n_tokens
         |FROM y ORDER BY doc_id, chunk_idx""".stripMargin,

    // the mixing samplers draw from u = md5Long(text)/2^60 — BIGINT over
    // a DOUBLE cast of an exact power of two, so both engines compute
    // the identical double; pow-derived thresholds/keys are rounded to
    // 6 decimals before any comparison (pow is not correctly rounded)
    "temperature_mix" ->
      s"""WITH c AS (SELECT source AS dom, CAST(count(*) AS DOUBLE) AS n_d
         |  FROM documents GROUP BY source),
         |t AS (SELECT sum(n_d) AS n_total, sum(pow(n_d, 0.5)) AS z FROM c),
         |r AS (SELECT dom, round(least(CAST(1.0 AS DOUBLE),
         |    0.3 * n_total * pow(n_d, 0.5) / z / n_d), 6) AS rate
         |  FROM c CROSS JOIN t),
         |k AS (SELECT d.source, r.rate FROM documents d JOIN r ON d.source = r.dom
         |  WHERE ${md5LongSql("text")} / CAST(1152921504606846976 AS DOUBLE) < r.rate)
         |SELECT source, count(*) AS n_sampled, min(rate) AS rate
         |FROM k GROUP BY source ORDER BY source""".stripMargin,

    // mirrors Mixing.epochRepeatMix: UNCAPPED tempered rate, copies =
    // floor(rate) + (u < frac(rate)), stats weighted by copy count
    "epoch_repeat" ->
      s"""WITH c AS (SELECT source AS dom, CAST(count(*) AS DOUBLE) AS n_d
         |  FROM documents GROUP BY source),
         |t AS (SELECT sum(n_d) AS n_total, sum(pow(n_d, 0.5)) AS z FROM c),
         |r AS (SELECT dom, round(0.3 * n_total * pow(n_d, 0.5) / z / n_d, 6) AS rate
         |  FROM c CROSS JOIN t),
         |b AS (SELECT d.doc_id, d.source, r.rate,
         |  ${md5LongSql("text")} / CAST(1152921504606846976 AS DOUBLE) AS u
         |  FROM documents d JOIN r ON d.source = r.dom),
         |nc AS (SELECT doc_id, source, rate,
         |  CAST(floor(rate) AS BIGINT) + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS n_copies
         |  FROM b),
         |e AS (SELECT doc_id, source, rate FROM nc
         |  CROSS JOIN unnest(generate_series(1, n_copies)) WHERE n_copies > 0)
         |SELECT source, count(*) AS n_emitted, count(DISTINCT doc_id) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum, min(rate) AS rate
         |FROM e GROUP BY source ORDER BY source""".stripMargin,

    "quota_sample" ->
      s"""WITH r AS (SELECT lang, doc_id, row_number() OVER (
         |    PARTITION BY lang ORDER BY ${md5LongSql("text")}, doc_id) AS rn
         |  FROM documents)
         |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM r WHERE rn <= 30 GROUP BY lang ORDER BY lang""".stripMargin,

    "weighted_sample" ->
      s"""SELECT doc_id, round(pow(${md5LongSql("text")} / CAST(1152921504606846976 AS DOUBLE),
         |    CAST(1.0 AS DOUBLE) / n_chars), 6) AS w_key
         |FROM documents WHERE n_chars > 0
         |ORDER BY w_key DESC, doc_id LIMIT 50""".stripMargin,

    // the threshold plan selects the SAME rows as the top-k plan, so it
    // shares the oracle verbatim — hash equality proves the two shapes
    // agree on a real corpus, not just the spec fixture
    "weighted_sample_threshold" ->
      s"""SELECT doc_id, round(pow(${md5LongSql("text")} / CAST(1152921504606846976 AS DOUBLE),
         |    CAST(1.0 AS DOUBLE) / n_chars), 6) AS w_key
         |FROM documents WHERE n_chars > 0
         |ORDER BY w_key DESC, doc_id LIMIT 50""".stripMargin,

    // the exact-integer mirror of the distributed prefix sum: shard =
    // exclusive running token total div budget
    "pack_shards" ->
      s"""WITH tok AS (SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS n_tok FROM documents),
         |c AS (SELECT doc_id, n_tok, coalesce(sum(n_tok) OVER (
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM tok),
         |s AS (SELECT doc_id, n_tok, CAST(cum // 2000 AS BIGINT) AS shard FROM c)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM s GROUP BY shard ORDER BY shard""".stripMargin,

    // same prefix-sum pack with the budget counted in trained BPE
    // tokens (shares the bpe_merges training chain)
    "pack_shards_bpe" ->
      s"""WITH RECURSIVE ${bpeTrainCtes(10)},
         |u AS (SELECT doc_id, unnest(ws) AS word FROM wrd),
         |pw AS (SELECT word, CAST(len(syms) AS BIGINT) AS wt FROM vz10),
         |tj AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS n_tok FROM u JOIN pw USING (word) GROUP BY 1),
         |tok AS (SELECT d.doc_id, CAST(coalesce(tj.n_tok, 0) AS BIGINT) AS n_tok
         |  FROM documents d LEFT JOIN tj USING (doc_id)),
         |c AS (SELECT doc_id, n_tok, coalesce(sum(n_tok) OVER (
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM tok),
         |s AS (SELECT doc_id, n_tok, CAST(cum // 2000 AS BIGINT) AS shard FROM c)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM s GROUP BY shard ORDER BY shard""".stripMargin,

    // seeded deterministic shuffle into shards (mirrors
    // Mixing.shuffleShards: key = md5Long('graft:' || doc_id), shard =
    // key % 16, per-shard rank by key; first_doc + order checksum pin
    // the permutation, not just membership)
    "shuffle_shards" ->
      s"""WITH b AS (SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS n_words,
         |    ${md5LongSql("'graft:' || doc_id")} AS skey FROM documents),
         |s AS (SELECT doc_id, n_words, skey, CAST(skey % 16 AS BIGINT) AS shard_id FROM b),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY shard_id ORDER BY skey, doc_id) AS BIGINT) AS rk FROM s)
         |SELECT shard_id, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS first_doc,
         |  CAST(sum(((skey % 2147483647) * (rk % 2147483647)) % 2147483647) AS BIGINT) AS order_checksum
         |FROM r GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    "cross_modal" ->
      """WITH e AS (SELECT vec_id, label,
        |  sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm FROM embeddings)
        |SELECT label, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
        |  round(CAST(sum(CAST(nrm AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS avg_norm
        |FROM documents d JOIN e ON d.doc_id = e.vec_id
        |GROUP BY label ORDER BY label""".stripMargin,

    "ann_sq_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$SqCtes,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
         |s AS (SELECT qid, d.vec_id, round(list_cosine_similarity(qv, vhat), 6) AS approx_sim
         |  FROM q CROSS JOIN dec d WHERE d.vec_id <> qid),
         |r AS (SELECT qid, vec_id, approx_sim,
         |  row_number() OVER (PARTITION BY qid ORDER BY approx_sim DESC, vec_id) AS rn FROM s)
         |SELECT qid, vec_id, approx_sim FROM r WHERE rn <= 5
         |ORDER BY qid, approx_sim DESC, vec_id""".stripMargin,

    "ann_sq_rerank" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$SqCtes,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
         |s AS (SELECT qid, d.vec_id, round(list_cosine_similarity(qv, vhat), 6) AS approx_sim
         |  FROM q CROSS JOIN dec d WHERE d.vec_id <> qid),
         |sl AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |  row_number() OVER (PARTITION BY qid ORDER BY approx_sim DESC, vec_id) AS srn FROM s)
         |  WHERE srn <= 20),
         |x AS (SELECT sl.qid, sl.vec_id, round(list_cosine_similarity(q2.qv, e2.v), 6) AS cos_sim
         |  FROM sl JOIN q q2 ON q2.qid = sl.qid JOIN e e2 ON e2.vec_id = sl.vec_id),
         |r AS (SELECT qid, vec_id, cos_sim,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn FROM x)
         |SELECT qid, vec_id, cos_sim FROM r WHERE rn <= 5
         |ORDER BY qid, cos_sim DESC, vec_id""".stripMargin,

    "bm25_topk" ->
      s"""WITH $Bm25Cte,
         |qterms AS (SELECT unnest([${Bm25QueryTerms.map(t => s"'$t'").mkString(", ")}]) AS term),
         |wv AS (SELECT p.doc_id, $Bm25W AS w
         |  FROM post p JOIN qterms USING (term) JOIN lex USING (term)
         |  JOIN dlen dd ON dd.doc_id = p.doc_id CROSS JOIN stats),
         |s AS (SELECT doc_id, CAST(sum(w) AS DOUBLE) AS score FROM wv GROUP BY doc_id)
         |SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // the incremental replay serves the SAME query from a base+delta
    // (then compacted) index — the oracle is the full-corpus formula,
    // identical to bm25_topk's, which is exactly the point
    "bm25_incremental" ->
      s"""WITH $Bm25Cte,
         |qterms AS (SELECT unnest([${Bm25QueryTerms.map(t => s"'$t'").mkString(", ")}]) AS term),
         |wv AS (SELECT p.doc_id, $Bm25W AS w
         |  FROM post p JOIN qterms USING (term) JOIN lex USING (term)
         |  JOIN dlen dd ON dd.doc_id = p.doc_id CROSS JOIN stats),
         |s AS (SELECT doc_id, CAST(sum(w) AS DOUBLE) AS score FROM wv GROUP BY doc_id)
         |SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "bm25_multi" ->
      s"""WITH $Bm25Cte,
         |$Bm25MultiCtes
         |SELECT qid, doc_id, score, CAST(bm_rank AS BIGINT) AS bm_rank
         |FROM br WHERE bm_rank <= 5 ORDER BY qid, bm_rank""".stripMargin,

    "hybrid_rrf" ->
      s"""WITH $Bm25Cte,
         |$Bm25MultiCtes,
         |b20 AS (SELECT qid, doc_id, bm_rank FROM br WHERE bm_rank <= 20),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
         |sc AS (SELECT qid, vec_id AS doc_id, round(list_cosine_similarity(qv, v), 6) AS cos_sim
         |  FROM q JOIN e ON vec_id <> qid),
         |ar AS (SELECT qid, doc_id,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, doc_id) AS ann_rank FROM sc),
         |a20 AS (SELECT qid, doc_id, ann_rank FROM ar WHERE ann_rank <= 20),
         |f AS (SELECT coalesce(b.qid, a.qid) AS qid, coalesce(b.doc_id, a.doc_id) AS doc_id,
         |  CAST(coalesce(CAST(round(1.0 / (60 + b.bm_rank), 6) AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)))
         |     + coalesce(CAST(round(1.0 / (60 + a.ann_rank), 6) AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score
         |  FROM b20 b FULL OUTER JOIN a20 a ON a.qid = b.qid AND a.doc_id = b.doc_id),
         |r AS (SELECT qid, doc_id, rrf_score,
         |  row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id) AS rn FROM f)
         |SELECT qid, doc_id, rrf_score FROM r WHERE rn <= 10
         |ORDER BY qid, rrf_score DESC, doc_id""".stripMargin,

    // mirrors TextRanking.ragContext: the hybrid_rrf fusion at k = 5,
    // then greedy word-budget packing in fused-rank order (256 words)
    "rag_context" ->
      s"""WITH $Bm25Cte,
         |$Bm25MultiCtes,
         |b20 AS (SELECT qid, doc_id, bm_rank FROM br WHERE bm_rank <= 20),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
         |sc AS (SELECT qid, vec_id AS doc_id, round(list_cosine_similarity(qv, v), 6) AS cos_sim
         |  FROM q JOIN e ON vec_id <> qid),
         |ar AS (SELECT qid, doc_id,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, doc_id) AS ann_rank FROM sc),
         |a20 AS (SELECT qid, doc_id, ann_rank FROM ar WHERE ann_rank <= 20),
         |f AS (SELECT coalesce(b.qid, a.qid) AS qid, coalesce(b.doc_id, a.doc_id) AS doc_id,
         |  CAST(coalesce(CAST(round(1.0 / (60 + b.bm_rank), 6) AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)))
         |     + coalesce(CAST(round(1.0 / (60 + a.ann_rank), 6) AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score
         |  FROM b20 b FULL OUTER JOIN a20 a ON a.qid = b.qid AND a.doc_id = b.doc_id),
         |r AS (SELECT qid, doc_id, rrf_score,
         |  row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id) AS rn FROM f),
         |topk AS (SELECT qid, doc_id, rn AS rank FROM r WHERE rn <= 5),
         |wc AS (SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS n_words FROM documents),
         |cw AS (SELECT t.qid, t.rank, t.doc_id, w.n_words,
         |  CAST(sum(w.n_words) OVER (PARTITION BY t.qid ORDER BY t.rank) AS BIGINT) AS cum_words
         |  FROM topk t JOIN wc w USING (doc_id))
         |SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, n_words, cum_words
         |FROM cw WHERE cum_words <= 256 ORDER BY qid, rank""".stripMargin,

    "hybrid_rrf_ann" ->
      s"""WITH $Bm25Cte,
         |$Bm25MultiCtes,
         |b5 AS (SELECT qid, doc_id, bm_rank FROM br WHERE bm_rank <= 5),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${ivfPqProbeChainCtes(nprobe = 2, shortlist = 20)},
         |ar AS (SELECT qid, vec_id AS doc_id,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS ann_rank FROM x),
         |a5 AS (SELECT qid, doc_id, ann_rank FROM ar WHERE ann_rank <= 5),
         |f AS (SELECT coalesce(b.qid, a.qid) AS qid, coalesce(b.doc_id, a.doc_id) AS doc_id,
         |  CAST(coalesce(CAST(round(1.0 / (60 + b.bm_rank), 6) AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)))
         |     + coalesce(CAST(round(1.0 / (60 + a.ann_rank), 6) AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score
         |  FROM b5 b FULL OUTER JOIN a5 a ON a.qid = b.qid AND a.doc_id = b.doc_id),
         |r AS (SELECT qid, doc_id, rrf_score,
         |  row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id) AS rn FROM f)
         |SELECT qid, doc_id, rrf_score FROM r WHERE rn <= 10
         |ORDER BY qid, rrf_score DESC, doc_id""".stripMargin,

    // mirrors Multimodal.phashNearDup: stub arm = md5-60 over text;
    // planted arm = the deterministic 8x8 PNGs' aHash recomputed from
    // the SHARED pixel formula (md5-60 % 256 per cell, one-cell edit at
    // j=1, exact dyadic mean) — the Spark side must recover the same
    // values through the real encode->ImageIO-decode->block-average
    // path. 7-band split (4x9 + 3x8 bits — lossless at hamming <= 6 by
    // pigeonhole) band candidates, exact bit_count(xor) verify.
    "media_phash_dedup" ->
      s"""WITH pc AS (SELECT g.g, j.j, c.cell,
         |    ${md5LongSql("concat('img:', CAST(g.g AS VARCHAR), ':', CAST(c.cell AS VARCHAR))")} % 256 AS v0
         |  FROM (SELECT unnest(generate_series(0, 3)) AS g) g
         |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) j
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS cell) c),
         |pv AS (SELECT -1000000000 + g * 3 + j AS doc_id, cell,
         |    CASE WHEN j = 1 AND cell = 0 THEN (v0 + 64) % 256 ELSE v0 END AS v
         |  FROM pc),
         |pm AS (SELECT doc_id, CAST(sum(v) AS DOUBLE) / 64.0 AS mean FROM pv GROUP BY 1),
         |pp AS (SELECT pv.doc_id,
         |    CAST(sum(CASE WHEN pv.cell < 60 AND CAST(pv.v AS DOUBLE) > pm.mean
         |      THEN (CAST(1 AS BIGINT) << pv.cell) ELSE 0 END) AS BIGINT) AS phash
         |  FROM pv JOIN pm USING (doc_id) GROUP BY 1),
         |ph AS (SELECT doc_id, ${md5LongSql("text")} AS phash FROM documents
         |  UNION ALL SELECT doc_id, phash FROM pp),
         |bnd AS (SELECT doc_id, phash, r.i, (phash >> r.sh) & r.mk AS bb
         |  FROM ph CROSS JOIN (VALUES (0,0,511),(1,9,511),(2,18,511),(3,27,511),
         |    (4,36,255),(5,44,255),(6,52,255)) r(i, sh, mk)),
         |cp AS (SELECT DISTINCT a.doc_id AS doc_a, a.phash AS pa,
         |    b.doc_id AS doc_b, b.phash AS pb
         |  FROM bnd a JOIN bnd b ON a.i = b.i AND a.bb = b.bb
         |  AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
         |FROM cp WHERE bit_count(xor(pa, pb)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,

    // mirrors Multimodal.phashNearDupWide: 240-bit wide hash — corpus
    // stubs derive DIGEST-ONCE (limb k = md5-60 of md5(text) ++ ':k',
    // one full-payload digest then four tag digests); planted PNGs get the
    // 16x16 aHash recomputed from the shared pixel formula (cell (r,c)
    // subdivides pixel (r/2, c/2), 256-cell mean == 64-pixel mean
    // exactly); limb-aligned 7-band split (6x30 + 1x60 bits, lossless
    // at hamming <= 6), exact 4-limb bit_count(xor) verify.
    "media_phash_dedup_wide" ->
      s"""WITH pg AS (SELECT g.g, p.pix,
         |    ${md5LongSql("concat('img:', CAST(g.g AS VARCHAR), ':', CAST(p.pix AS VARCHAR))")} % 256 AS v0
         |  FROM (SELECT unnest(generate_series(0, 3)) AS g) g
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pix) p),
         |pv2 AS (SELECT -1000000000 + c.g * 3 + j.j AS doc_id, c.cell,
         |    CASE WHEN j.j = 1 AND c.pix = 0 THEN (c.v0 + 64) % 256 ELSE c.v0 END AS v
         |  FROM (SELECT pg.g, pg.v0, pg.pix, cc.cell
         |    FROM (SELECT unnest(generate_series(0, 255)) AS cell) cc
         |    JOIN pg ON pg.pix = ((cc.cell // 16) // 2) * 8 + ((cc.cell % 16) // 2)) c
         |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) j),
         |pm2 AS (SELECT doc_id, CAST(sum(v) AS DOUBLE) / 256.0 AS mean FROM pv2 GROUP BY 1),
         |pp2 AS (SELECT pv2.doc_id,
         |  CAST(sum(CASE WHEN pv2.cell < 60 AND CAST(pv2.v AS DOUBLE) > pm2.mean
         |    THEN (CAST(1 AS BIGINT) << pv2.cell) ELSE 0 END) AS BIGINT) AS h0,
         |  CAST(sum(CASE WHEN pv2.cell >= 60 AND pv2.cell < 120 AND CAST(pv2.v AS DOUBLE) > pm2.mean
         |    THEN (CAST(1 AS BIGINT) << (pv2.cell - 60)) ELSE 0 END) AS BIGINT) AS h1,
         |  CAST(sum(CASE WHEN pv2.cell >= 120 AND pv2.cell < 180 AND CAST(pv2.v AS DOUBLE) > pm2.mean
         |    THEN (CAST(1 AS BIGINT) << (pv2.cell - 120)) ELSE 0 END) AS BIGINT) AS h2,
         |  CAST(sum(CASE WHEN pv2.cell >= 180 AND pv2.cell < 240 AND CAST(pv2.v AS DOUBLE) > pm2.mean
         |    THEN (CAST(1 AS BIGINT) << (pv2.cell - 180)) ELSE 0 END) AS BIGINT) AS h3
         |  FROM pv2 JOIN pm2 USING (doc_id) GROUP BY 1),
         |ph AS (SELECT doc_id,
         |    ${md5LongSql("concat(md5(text), ':0')")} AS h0, ${md5LongSql("concat(md5(text), ':1')")} AS h1,
         |    ${md5LongSql("concat(md5(text), ':2')")} AS h2, ${md5LongSql("concat(md5(text), ':3')")} AS h3
         |  FROM documents
         |  UNION ALL SELECT doc_id, h0, h1, h2, h3 FROM pp2),
         |bnd AS (SELECT doc_id, h0, h1, h2, h3, r.i,
         |  CASE r.i WHEN 0 THEN h0 & 1073741823 WHEN 1 THEN (h0 >> 30) & 1073741823
         |    WHEN 2 THEN h1 & 1073741823 WHEN 3 THEN (h1 >> 30) & 1073741823
         |    WHEN 4 THEN h2 & 1073741823 WHEN 5 THEN (h2 >> 30) & 1073741823
         |    ELSE h3 END AS bb
         |  FROM ph CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) r(i)),
         |cp AS (SELECT DISTINCT a.doc_id AS doc_a, a.h0 AS a0, a.h1 AS a1, a.h2 AS a2, a.h3 AS a3,
         |    b.doc_id AS doc_b, b.h0 AS b0, b.h1 AS b1, b.h2 AS b2, b.h3 AS b3
         |  FROM bnd a JOIN bnd b ON a.i = b.i AND a.bb = b.bb AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(a0, b0)) AS INT) + CAST(bit_count(xor(a1, b1)) AS INT)
         |     + CAST(bit_count(xor(a2, b2)) AS INT) + CAST(bit_count(xor(a3, b3)) AS INT) AS hamming
         |FROM cp
         |WHERE CAST(bit_count(xor(a0, b0)) AS INT) + CAST(bit_count(xor(a1, b1)) AS INT)
         |    + CAST(bit_count(xor(a2, b2)) AS INT) + CAST(bit_count(xor(a3, b3)) AS INT) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,

    "multimodal_meta" ->
      s"""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS nb,
         |  ${md5LongSql("text")} AS h FROM documents)
         |SELECT doc_id, CAST(nb AS BIGINT) AS n_bytes, md5(text) AS media_md5,
         |  CASE nb % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webm' END AS format,
         |  h % 1280 AS width, (h // 1280) % 720 AS height, CAST(nb % 30 + 1 AS BIGINT) AS n_frames
         |FROM b ORDER BY doc_id""".stripMargin,

    "multimodal_format_stats" ->
      s"""WITH b AS (SELECT doc_id, octet_length(encode(text)) AS nb, ${md5LongSql("text")} AS h FROM documents),
         |f AS (SELECT CASE nb % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webm' END AS format,
         |  CAST(nb AS BIGINT) AS n_bytes, h % 1280 AS width FROM b)
         |SELECT format, count(*) AS n_media, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         |round(avg(width),4) AS avg_width FROM f GROUP BY format ORDER BY format""".stripMargin,

    "multimodal_frames" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
        |f AS (SELECT doc_id, CAST(nb % 30 + 1 AS BIGINT) AS n_frames FROM b WHERE nb % 3 = 2)
        |SELECT doc_id, n_frames, CAST(unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 5)) AS BIGINT) AS frame_idx
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_resize" ->
      s"""WITH b AS (SELECT doc_id, octet_length(encode(text)) AS nb, ${md5LongSql("text")} AS h FROM documents),
         |g AS (SELECT doc_id, h % 1280 AS width, (h // 1280) % 720 AS height FROM b WHERE nb % 3 IN (0, 1)),
         |s AS (SELECT doc_id, width, height, CAST(greatest(width, 1) AS DOUBLE) AS w,
         |  CAST(greatest(height, 1) AS DOUBLE) AS hh FROM g)
         |SELECT doc_id, width, height,
         |  CAST(floor(w * least(CAST(224.0 AS DOUBLE) / w, CAST(224.0 AS DOUBLE) / hh)) AS BIGINT) AS out_width,
         |  CAST(floor(hh * least(CAST(224.0 AS DOUBLE) / w, CAST(224.0 AS DOUBLE) / hh)) AS BIGINT) AS out_height
         |FROM s ORDER BY doc_id""".stripMargin,

    "pipeline_filtered_docs" ->
      s"""WITH b AS (SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS n_words,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio
         |  FROM documents),
         |q AS (SELECT doc_id, n_words,
         |  round(least(CAST(1.0 AS DOUBLE), n_words / 50.0) * (CAST(1.0 AS DOUBLE) - punct_ratio), 4) AS quality_score FROM b),
         |k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(lower(text)))
         |SELECT q.doc_id, n_words, quality_score FROM q JOIN k ON q.doc_id = k.doc_id
         |WHERE quality_score >= 0.3 AND n_words BETWEEN 20 AND 5000 ORDER BY q.doc_id""".stripMargin,

    // the composed batch pipeline (mirrors CurationPipeline
    // .trainingManifest stage for stage: keep-best dedup -> quality
    // gate -> benchmark holdout + exact 13-gram decontamination ->
    // 64/8 chunking; every fragment shared with its standalone oracle)
    "pipeline_training_manifest" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")},
         |cl AS (SELECT doc_id, cluster_rep, cluster_size FROM allc JOIN rep USING (comp)),
         |qb AS (SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS n_words,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio
         |  FROM documents),
         |qq AS (SELECT doc_id, round(least(CAST(1.0 AS DOUBLE), n_words / 50.0) * (CAST(1.0 AS DOUBLE) - punct_ratio), 4) AS quality_score FROM qb),
         |rk AS (SELECT cl.doc_id, cluster_rep, cluster_size, qq.quality_score,
         |  row_number() OVER (PARTITION BY cluster_rep ORDER BY qq.quality_score DESC, cl.doc_id) AS rn
         |  FROM cl JOIN qq ON qq.doc_id = cl.doc_id),
         |kp AS (SELECT rk.doc_id, rk.quality_score FROM rk JOIN qb ON qb.doc_id = rk.doc_id
         |  WHERE rk.rn = 1 AND rk.quality_score >= 0.3
         |    AND qb.n_words BETWEEN 20 AND 5000 AND rk.doc_id % 20 <> 0),
         |gl AS (SELECT doc_id, CASE WHEN len(ws) < 13 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-12), i -> array_to_string(list_slice(ws, i, i+12), ' ')) END AS garr FROM wrd WHERE len(ws) > 0),
         |g AS (SELECT DISTINCT doc_id, unnest(garr) AS gram FROM gl),
         |flagged AS (SELECT DISTINCT cg.doc_id FROM g cg
         |  JOIN (SELECT gram FROM g WHERE doc_id % 20 = 0) bg USING (gram)
         |  WHERE cg.doc_id % 20 <> 0),
         |clean AS (SELECT k.doc_id, k.quality_score FROM kp k
         |  LEFT JOIN flagged f ON f.doc_id = k.doc_id WHERE f.doc_id IS NULL),
         |cn AS (SELECT w.doc_id, w.ws, len(w.ws) AS n FROM wrd w JOIN clean USING (doc_id)),
         |cc AS (SELECT doc_id, ws, greatest(CAST(1 AS BIGINT), CAST(ceil((n - 8) / 56.0) AS BIGINT)) AS n_chunks FROM cn),
         |cx AS (SELECT doc_id, ws, unnest(generate_series(0, n_chunks - 1)) AS ci FROM cc),
         |cy AS (SELECT doc_id, len(list_slice(ws, ci*56 + 1, ci*56 + 64)) AS nt FROM cx),
         |ca AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks, CAST(sum(nt) AS BIGINT) AS n_tokens
         |  FROM cy GROUP BY doc_id)
         |SELECT ca.doc_id, clean.quality_score, ca.n_chunks, ca.n_tokens
         |FROM ca JOIN clean USING (doc_id) ORDER BY ca.doc_id""".stripMargin,

    // mirrors CurationPipeline.curriculumManifest: the manifest's
    // survivor set (CTE `clean`), full-corpus surprisal lexicon,
    // z-bands from survivor-only statistics
    "pipeline_curriculum_manifest" ->
      s"""WITH RECURSIVE $JaccardCte,
         |$MinhashPairsCtes,
         |${docComponentsCtes("mhp")},
         |cl AS (SELECT doc_id, cluster_rep, cluster_size FROM allc JOIN rep USING (comp)),
         |qb AS (SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS n_words,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio
         |  FROM documents),
         |qq AS (SELECT doc_id, round(least(CAST(1.0 AS DOUBLE), n_words / 50.0) * (CAST(1.0 AS DOUBLE) - punct_ratio), 4) AS quality_score FROM qb),
         |rk AS (SELECT cl.doc_id, cluster_rep, cluster_size, qq.quality_score,
         |  row_number() OVER (PARTITION BY cluster_rep ORDER BY qq.quality_score DESC, cl.doc_id) AS rn
         |  FROM cl JOIN qq ON qq.doc_id = cl.doc_id),
         |kp AS (SELECT rk.doc_id, rk.quality_score FROM rk JOIN qb ON qb.doc_id = rk.doc_id
         |  WHERE rk.rn = 1 AND rk.quality_score >= 0.3
         |    AND qb.n_words BETWEEN 20 AND 5000 AND rk.doc_id % 20 <> 0),
         |gl AS (SELECT doc_id, CASE WHEN len(ws) < 13 THEN [array_to_string(ws, ' ')]
         |  ELSE list_transform(generate_series(1, len(ws)-12), i -> array_to_string(list_slice(ws, i, i+12), ' ')) END AS garr FROM wrd WHERE len(ws) > 0),
         |g AS (SELECT DISTINCT doc_id, unnest(garr) AS gram FROM gl),
         |flagged AS (SELECT DISTINCT cg.doc_id FROM g cg
         |  JOIN (SELECT gram FROM g WHERE doc_id % 20 = 0) bg USING (gram)
         |  WHERE cg.doc_id % 20 <> 0),
         |clean AS (SELECT k.doc_id, k.quality_score FROM kp k
         |  LEFT JOIN flagged f ON f.doc_id = k.doc_id WHERE f.doc_id IS NULL),
         |cu_t AS (SELECT doc_id, unnest(ws) AS w FROM wrd),
         |cu_lex AS (SELECT w, count(*) AS c FROM cu_t GROUP BY 1),
         |cu_st AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM cu_lex),
         |cu_sc AS (SELECT doc_id, CAST(round(-ln((CAST(c AS DOUBLE) + 1.0) / CAST(n + v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS s
         |  FROM cu_t JOIN cu_lex USING (w) CROSS JOIN cu_st),
         |cu_ds AS (SELECT doc_id, count(*) AS n_words, sum(s) AS nll FROM cu_sc GROUP BY 1),
         |cu_davg AS (SELECT d.doc_id, CAST(floor(CAST(nll AS DOUBLE) / n_words * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS d6
         |  FROM cu_ds d JOIN clean USING (doc_id)),
         |cu_stats AS (SELECT count(*) AS n, sum(d6) AS sd, sum(d6 * d6) AS sd2 FROM cu_davg),
         |cu_j AS (SELECT doc_id, CAST(d6 AS DOUBLE) AS difficulty,
         |  CAST(sd AS DOUBLE) / n AS mean, CAST(sd2 AS DOUBLE) / n AS ex2 FROM cu_davg CROSS JOIN cu_stats)
         |SELECT doc_id, difficulty,
         |  CASE WHEN difficulty < mean - sqrt(ex2 - mean * mean) THEN 1
         |       WHEN difficulty < mean THEN 2
         |       WHEN difficulty < mean + sqrt(ex2 - mean * mean) THEN 3
         |       ELSE 4 END AS phase,
         |  CAST(${md5LongSql("'cur:' || doc_id")} % 16 AS INTEGER) AS shard
         |FROM cu_j ORDER BY doc_id""".stripMargin,

    "curation_replay" -> curationReplaySql(nBatches = 3, threshold = 0.2),
    "curation_replay_decontam" ->
      curationReplayDecontamSql(nBatches = 3, threshold = 0.2),
    "vector_curation_replay" -> vectorReplaySql(nBatches = 3, threshold = 0.35),

    // mirrors CurationPipeline.mediaCurationReplay on the WIDE 240-bit
    // hash (round 14: the incremental gate migrated off the measured-
    // quadratic 60-bit banding onto the limb-aligned wide index — this
    // oracle mirrors the wide population exactly as media_phash_dedup_
    // wide does: digest-once md5-60 limb stubs over md5(text) ++ ':k',
    // planted 16x16 aHashes recomputed from the shared pixel formula),
    // replayed as 3 sequential batches. DIRECT 4-limb hamming joins
    // stand in for the banded candidate generation — the 7-band limb
    // split is lossless at hamming <= 6 (pigeonhole, MultimodalSpec),
    // so this oracle independently checks the banding itself: a
    // candidate set that missed a pair would hash-mismatch. In-batch
    // rule: dropped if ANY smaller-id batch doc (survivor or not) is
    // within the radius; cross-batch rule: dropped on any hit against
    // prior batches' SURVIVOR index.
    "media_curation_replay" ->
      s"""WITH pg AS (SELECT g.g, p.pix,
         |    ${md5LongSql("concat('img:', CAST(g.g AS VARCHAR), ':', CAST(p.pix AS VARCHAR))")} % 256 AS v0
         |  FROM (SELECT unnest(generate_series(0, 3)) AS g) g
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pix) p),
         |pv2 AS (SELECT -1000000000 + c.g * 3 + j.j AS doc_id, c.cell,
         |    CASE WHEN j.j = 1 AND c.pix = 0 THEN (c.v0 + 64) % 256 ELSE c.v0 END AS v
         |  FROM (SELECT pg.g, pg.v0, pg.pix, cc.cell
         |    FROM (SELECT unnest(generate_series(0, 255)) AS cell) cc
         |    JOIN pg ON pg.pix = ((cc.cell // 16) // 2) * 8 + ((cc.cell % 16) // 2)) c
         |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) j),
         |pm2 AS (SELECT doc_id, CAST(sum(v) AS DOUBLE) / 256.0 AS mean FROM pv2 GROUP BY 1),
         |pp2 AS (SELECT pv2.doc_id,
         |  CAST(sum(CASE WHEN pv2.cell < 60 AND CAST(pv2.v AS DOUBLE) > pm2.mean
         |    THEN (CAST(1 AS BIGINT) << pv2.cell) ELSE 0 END) AS BIGINT) AS h0,
         |  CAST(sum(CASE WHEN pv2.cell >= 60 AND pv2.cell < 120 AND CAST(pv2.v AS DOUBLE) > pm2.mean
         |    THEN (CAST(1 AS BIGINT) << (pv2.cell - 60)) ELSE 0 END) AS BIGINT) AS h1,
         |  CAST(sum(CASE WHEN pv2.cell >= 120 AND pv2.cell < 180 AND CAST(pv2.v AS DOUBLE) > pm2.mean
         |    THEN (CAST(1 AS BIGINT) << (pv2.cell - 120)) ELSE 0 END) AS BIGINT) AS h2,
         |  CAST(sum(CASE WHEN pv2.cell >= 180 AND pv2.cell < 240 AND CAST(pv2.v AS DOUBLE) > pm2.mean
         |    THEN (CAST(1 AS BIGINT) << (pv2.cell - 180)) ELSE 0 END) AS BIGINT) AS h3
         |  FROM pv2 JOIN pm2 USING (doc_id) GROUP BY 1),
         |ph AS (SELECT doc_id,
         |    ${md5LongSql("concat(md5(text), ':0')")} AS h0, ${md5LongSql("concat(md5(text), ':1')")} AS h1,
         |    ${md5LongSql("concat(md5(text), ':2')")} AS h2, ${md5LongSql("concat(md5(text), ':3')")} AS h3
         |  FROM documents
         |  UNION ALL SELECT doc_id, h0, h1, h2, h3 FROM pp2),
         |b AS (SELECT doc_id, h0, h1, h2, h3, ((doc_id % 3) + 3) % 3 AS bt FROM ph),
         |s0 AS (SELECT * EXCLUDE (bt) FROM b x WHERE bt = 0 AND NOT EXISTS (
         |    SELECT 1 FROM b y WHERE y.bt = 0 AND y.doc_id < x.doc_id
         |      AND CAST(bit_count(xor(x.h0, y.h0)) AS INT) + CAST(bit_count(xor(x.h1, y.h1)) AS INT)
         |        + CAST(bit_count(xor(x.h2, y.h2)) AS INT) + CAST(bit_count(xor(x.h3, y.h3)) AS INT) <= 6)),
         |s1 AS (SELECT * EXCLUDE (bt) FROM b x WHERE bt = 1
         |  AND NOT EXISTS (SELECT 1 FROM s0 y
         |      WHERE CAST(bit_count(xor(x.h0, y.h0)) AS INT) + CAST(bit_count(xor(x.h1, y.h1)) AS INT)
         |        + CAST(bit_count(xor(x.h2, y.h2)) AS INT) + CAST(bit_count(xor(x.h3, y.h3)) AS INT) <= 6)
         |  AND NOT EXISTS (SELECT 1 FROM b y WHERE y.bt = 1 AND y.doc_id < x.doc_id
         |      AND CAST(bit_count(xor(x.h0, y.h0)) AS INT) + CAST(bit_count(xor(x.h1, y.h1)) AS INT)
         |        + CAST(bit_count(xor(x.h2, y.h2)) AS INT) + CAST(bit_count(xor(x.h3, y.h3)) AS INT) <= 6)),
         |s2 AS (SELECT * EXCLUDE (bt) FROM b x WHERE bt = 2
         |  AND NOT EXISTS (SELECT 1 FROM (SELECT h0, h1, h2, h3 FROM s0
         |      UNION ALL SELECT h0, h1, h2, h3 FROM s1) y
         |      WHERE CAST(bit_count(xor(x.h0, y.h0)) AS INT) + CAST(bit_count(xor(x.h1, y.h1)) AS INT)
         |        + CAST(bit_count(xor(x.h2, y.h2)) AS INT) + CAST(bit_count(xor(x.h3, y.h3)) AS INT) <= 6)
         |  AND NOT EXISTS (SELECT 1 FROM b y WHERE y.bt = 2 AND y.doc_id < x.doc_id
         |      AND CAST(bit_count(xor(x.h0, y.h0)) AS INT) + CAST(bit_count(xor(x.h1, y.h1)) AS INT)
         |        + CAST(bit_count(xor(x.h2, y.h2)) AS INT) + CAST(bit_count(xor(x.h3, y.h3)) AS INT) <= 6))
         |SELECT doc_id, CAST(0 AS BIGINT) AS batch_id FROM s0
         |UNION ALL SELECT doc_id, CAST(1 AS BIGINT) AS batch_id FROM s1
         |UNION ALL SELECT doc_id, CAST(2 AS BIGINT) AS batch_id FROM s2
         |ORDER BY doc_id""".stripMargin,

    // mirrors Multimodal.phashNearDupMixed: the wide pair query over the
    // MIXED population (every 100th doc a REAL formula-pixel PNG in
    // identical-pixel triplets, digest-once stubs elsewhere, planted
    // PNGs riding along) — the real decode arm at corpus-proportional
    // mass, banding + verify identical to media_phash_dedup_wide.
    "media_phash_dedup_mixed" ->
      s"""WITH ${mixedWidePhCtes()},
         |bnd AS (SELECT doc_id, h0, h1, h2, h3, r.i,
         |  CASE r.i WHEN 0 THEN h0 & 1073741823 WHEN 1 THEN (h0 >> 30) & 1073741823
         |    WHEN 2 THEN h1 & 1073741823 WHEN 3 THEN (h1 >> 30) & 1073741823
         |    WHEN 4 THEN h2 & 1073741823 WHEN 5 THEN (h2 >> 30) & 1073741823
         |    ELSE h3 END AS bb
         |  FROM ph CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) r(i)),
         |cp AS (SELECT DISTINCT a.doc_id AS doc_a, a.h0 AS a0, a.h1 AS a1, a.h2 AS a2, a.h3 AS a3,
         |    b.doc_id AS doc_b, b.h0 AS b0, b.h1 AS b1, b.h2 AS b2, b.h3 AS b3
         |  FROM bnd a JOIN bnd b ON a.i = b.i AND a.bb = b.bb AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, ${wideHamSql("a", "b")} AS hamming
         |FROM cp WHERE ${wideHamSql("a", "b")} <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,

    // mirrors CurationPipeline.mediaCurationReplayMixed: the media-gate
    // replay over the mixed population — sequential direct-hamming
    // unroll exactly as media_curation_replay, population as above.
    "media_curation_replay_mixed" ->
      s"""WITH ${mixedWidePhCtes()},
         |b AS (SELECT doc_id, h0, h1, h2, h3, ((doc_id % 3) + 3) % 3 AS bt FROM ph),
         |s0 AS (SELECT * EXCLUDE (bt) FROM b x WHERE bt = 0 AND NOT EXISTS (
         |    SELECT 1 FROM b y WHERE y.bt = 0 AND y.doc_id < x.doc_id
         |      AND ${wideHamSql("x.h", "y.h")} <= 6)),
         |s1 AS (SELECT * EXCLUDE (bt) FROM b x WHERE bt = 1
         |  AND NOT EXISTS (SELECT 1 FROM s0 y
         |      WHERE ${wideHamSql("x.h", "y.h")} <= 6)
         |  AND NOT EXISTS (SELECT 1 FROM b y WHERE y.bt = 1 AND y.doc_id < x.doc_id
         |      AND ${wideHamSql("x.h", "y.h")} <= 6)),
         |s2 AS (SELECT * EXCLUDE (bt) FROM b x WHERE bt = 2
         |  AND NOT EXISTS (SELECT 1 FROM (SELECT h0, h1, h2, h3 FROM s0
         |      UNION ALL SELECT h0, h1, h2, h3 FROM s1) y
         |      WHERE ${wideHamSql("x.h", "y.h")} <= 6)
         |  AND NOT EXISTS (SELECT 1 FROM b y WHERE y.bt = 2 AND y.doc_id < x.doc_id
         |      AND ${wideHamSql("x.h", "y.h")} <= 6))
         |SELECT doc_id, CAST(0 AS BIGINT) AS batch_id FROM s0
         |UNION ALL SELECT doc_id, CAST(1 AS BIGINT) AS batch_id FROM s1
         |UNION ALL SELECT doc_id, CAST(2 AS BIGINT) AS batch_id FROM s2
         |ORDER BY doc_id""".stripMargin
  )
}
