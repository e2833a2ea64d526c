#!/usr/bin/env bash
# Round-13 sf100 suite, CHUNKED: one JVM per family group (solo for the
# heavy class), /tmp/spark-local wiped-and-recreated between groups —
# the single-JVM full-suite run accumulated 51 GB of shuffle files by
# query 35 and would have filled the disk (within one app, shuffle
# files live until context GC; ContextCleaner rarely fires at 96 GB
# heap). Chunking bounds disk per group and matches the r12
# one-JVM-per-query discipline for the heavy class.
# Usage: r13_sf100_chain.sh  (run inside tmux; writes /tmp/sf100_groups)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/sf100_groups
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf100
export SPARK_DRIVER_MEM=96g
export GRAFT_BENCH_REPS=1
export GRAFT_BENCH_TRACE=1
export SPARK_LOCAL_DIRS=/tmp/spark-local

run_group() { # name csv [timeout_sec]
  local name="$1" csv="$2" tmo="${3:-7200}"
  rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
  echo "=== group $name start $(date +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
  GRAFT_BENCH_ONLY="$csv" GRAFT_BENCH_OUT="$OUT/$name.json" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "$OUT/$name.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

# fast relational/market/tick family — one JVM covers all
run_group market "cube_stats,cum_volume,daily_ohlcv,daily_stats,distinct_counts,enriched_by_segment,event_gaps,ewma_prices,except_tokens,hourly_bars,inactive_tokens,json_props,latest_prices_topk,latest_tick,mode_conditional,percentiles,pivot_counts,price_jumps,quantile_sketch,quantile_sketch_adaptive,range_join_errors,rank_by_day,rollup_stats,scaled_projection,seq_dedup,session_stats,session_window_agg,set_ops,tick_returns,time_format,time_range_scan,token_freshness,token_stats,tokens_by_type,volume_profile,vwap_daily,zorder_key"
run_group tpch "tpch_pricing_summary,tpch_top_orders,supplier_summary,revenue_by_region"
# text-analysis family (shared docs/session caches amortize)
run_group text1 "text_fingerprints,text_lang_id,text_lang_stats,text_redact,text_repetition,text_token_counts,length_buckets,token_histogram,token_entropy,stratified_sample,dataset_card,quality_rules"
run_group text2 "text_perplexity,text_perplexity_bigram,tfidf_keywords,pmi_collocations,distinct_ngram_diversity,ngram_dup_profile,hll_gram_cardinality,memorization_risk,domain_reweight,quality_classifier,curriculum_assign,importance_sample"
run_group text_quality_solo "text_quality"
# mixing/sampling family
run_group mixing "temperature_mix,quota_sample,weighted_sample,weighted_sample_threshold,epoch_repeat,pack_shards,pack_shards_bpe,shuffle_shards,rendezvous_shards,token_counts_bpe"
# embedding/vector family (2M vectors; index builds session-cached)
run_group vectors "similarity_topk,label_centroids,embedding_near_dup,embedding_outliers,semantic_clusters,hybrid_rrf,hybrid_rrf_ann,rag_context,mmr_rerank,knn_label_propagation"
# dedup family (narrow per-doc plans; shared sig/shingle caches)
run_group dedup1 "dedup_exact,dedup_exact_normalized,dedup_minhash,dedup_minhash_clusters,dedup_minhash_est,dedup_keep_best,simhash_sigs"
run_group dedup2 "dedup_ngram,dedup_ngram_clusters,dedup_ngram_clusters_t50,dedup_ngram_ppjoin,dedup_substring,dedup_cluster_histogram,leakage_free_split"
run_group dedup_simhash_solo "dedup_simhash"
run_group dedup_simhash_clusters_solo "dedup_simhash_clusters"
run_group graph "pagerank_neardup,triangle_stats,cross_modal" # cross_modal rerun cheap
run_group decontam "decontamination,decontamination_ngram,decontamination_bloom,decontamination_semantic"
# pipeline family
run_group pipeline_filtered "pipeline_filtered_docs,pipeline_training_manifest"
run_group pipeline_curriculum_solo "pipeline_curriculum_manifest"
# replay/harness faces
run_group vcr_solo "vector_curation_replay"
run_group crd_solo "curation_replay_decontam" 3600
# multimodal: the wide face is the scale path; the 60-bit faces carry
# the measured fixed-selectivity quadratic — timeboxed so an overrun is
# a RECORDED exclusion, not a stalled chain
run_group media_wide "media_phash_dedup_wide,multimodal_meta,multimodal_format_stats,multimodal_frames,multimodal_resize"
run_group media_60_solo "media_phash_dedup" 2400
run_group media_replay_solo "media_curation_replay" 2400
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
echo "CHAIN DONE $(date +%H:%M:%S)"
