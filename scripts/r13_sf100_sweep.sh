#!/usr/bin/env bash
# Round-13 sf100 sweep, CONSOLIDATED: all 152 registered queries in one
# priority-ordered chunked chain (supersedes r13_sf100_chain{,2,3}.sh,
# which assumed 34 queries salvaged from the first single-JVM attempt's
# trace — that trace lived in /tmp and did not survive the session
# boundary, so this script covers the full registry itself).
#
# Discipline unchanged from the chain scripts: one JVM per family group
# (heavy class solo), /tmp/spark-local wiped-and-recreated between
# groups — a single-JVM full-suite run accumulated 51 GB of shuffle
# files by query 35 (within one app, shuffle files live until context
# GC, which at 96 GB heap almost never fires), so chunking is what
# bounds disk at sf100.
#
# PRIORITY ORDER: groups carrying round-13 measurement claims run first
# (tick side at the fourth decade, the wide-vs-60-bit media faces, the
# adaptive quantile sketch); the expensive queries that already carry a
# round-12 isolated sf100 measurement run LAST, so an end-of-session
# interrupt costs only numbers that have an r12-iso fallback in the
# ladder. merge_sf100.py surfaces anything not reached as an explicit
# exclusion.
# Usage: r13_sf100_sweep.sh  (run inside tmux; writes /tmp/sf100_groups)
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
  if [ -s "$OUT/$name.json" ]; then
    echo "=== group $name SKIP (already landed)"
    return
  fi
  rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
  echo "=== group $name start $(date +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
  GRAFT_BENCH_ONLY="$csv" GRAFT_BENCH_OUT="$OUT/$name.json" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "$OUT/$name.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

# --- round-13 claim carriers first ---
# tick/market family at the fourth decade (600M lineitem / 100M events),
# incl. both quantile-sketch faces and percentiles
run_group market "cube_stats,cum_volume,daily_ohlcv,daily_stats,distinct_counts,enriched_by_segment,event_gaps,ewma_prices,except_tokens,hourly_bars,inactive_tokens,json_props,latest_prices_topk,latest_tick,mode_conditional,percentiles,pivot_counts,price_jumps,quantile_sketch,quantile_sketch_adaptive,range_join_errors,rank_by_day,rollup_stats,scaled_projection,seq_dedup,session_stats,session_window_agg,set_ops,tick_returns,time_format,time_range_scan,token_freshness,token_stats,tokens_by_type,volume_profile,vwap_daily,zorder_key" 5400
# the wide 240-bit face (the 100 TB media path) + cheap multimodal scans
run_group media_wide "media_phash_dedup_wide,multimodal_meta,multimodal_format_stats,multimodal_frames,multimodal_resize" 3600
# the 60-bit face: carries the measured fixed-selectivity quadratic —
# timeboxed so an overrun is a RECORDED exclusion, not a stalled chain
run_group media_60_solo "media_phash_dedup" 2400
# --- families with no prior sf100 number ---
run_group ann "ann_lsh_topk,ann_lsh_multiprobe,ann_lsh_multitable,ann_ivf_topk,ann_ivf_nprobe2,ann_pq_topk,ann_pq_rerank,ann_ivfpq_topk,ann_ivfpq_residual,ann_sq_topk,ann_sq_rerank" 5400
run_group relmisc "asof_join,asof_price,brand_revenue,charset_stats,cross_source_dups,cms_heavy_hitters,corpus_drift,corpus_drift_deciles,chunk_documents,cluster_balanced_sample,contrastive_pairs,contrastive_hard_negatives" 5400
run_group bpe "bpe_top_pairs,bpe_merges,bpe_encode,bpe_fertility" 3600
run_group bm25 "bm25_topk,bm25_multi,bm25_incremental" 2400
run_group tpch "tpch_pricing_summary,tpch_top_orders,supplier_summary,revenue_by_region" 2400
run_group text1 "text_fingerprints,text_lang_id,text_lang_stats,text_redact,text_repetition,text_token_counts,length_buckets,token_histogram,token_entropy,stratified_sample,dataset_card,quality_rules" 5400
run_group mixing "temperature_mix,quota_sample,weighted_sample,weighted_sample_threshold,epoch_repeat,pack_shards,pack_shards_bpe,shuffle_shards,rendezvous_shards,token_counts_bpe" 5400
run_group vectors "similarity_topk,label_centroids,embedding_near_dup,embedding_outliers,semantic_clusters,hybrid_rrf,hybrid_rrf_ann,rag_context,mmr_rerank,knn_label_propagation" 5400
run_group dedup1 "dedup_exact,dedup_exact_normalized,dedup_minhash,dedup_minhash_clusters,dedup_minhash_est,dedup_keep_best,simhash_sigs" 5400
run_group dedup2 "dedup_ngram,dedup_ngram_clusters,dedup_ngram_clusters_t50,dedup_ngram_ppjoin,dedup_substring,dedup_cluster_histogram,leakage_free_split" 5400
run_group graph "pagerank_neardup,triangle_stats,cross_modal" 2400
run_group decontam "decontamination,decontamination_ngram,decontamination_bloom,decontamination_semantic" 3600
run_group text2 "text_perplexity,text_perplexity_bigram,tfidf_keywords,pmi_collocations,distinct_ngram_diversity,ngram_dup_profile,hll_gram_cardinality,memorization_risk,domain_reweight,quality_classifier,curriculum_assign,importance_sample" 5400
run_group vcr_solo "vector_curation_replay" 1200
run_group media_replay_solo "media_curation_replay" 2400
run_group curation_replay_solo "curation_replay" 2400
# --- heavy class with an r12-iso fallback in the ladder runs LAST ---
run_group pipeline_filtered "pipeline_filtered_docs,pipeline_training_manifest" 3600
run_group text_quality_solo "text_quality" 2400
run_group dedup_simhash_solo "dedup_simhash" 1800
run_group crd_solo "curation_replay_decontam" 3600
run_group pipeline_curriculum_solo "pipeline_curriculum_manifest" 2400
run_group dedup_simhash_clusters_solo "dedup_simhash_clusters" 3600
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
echo "SWEEP DONE $(date +%H:%M:%S)"
