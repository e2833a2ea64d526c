#!/usr/bin/env bash
# Round-14 sf100 sweep: the full 154-query registry, under the round-14
# spill discipline — NO script sets SPARK_LOCAL_DIRS and NOTHING rm -rf's
# a shared root. Every JVM makes its own /tmp/graft-local.* sibling dir
# (GraftConf.privateLocalDirs) and deletes it in a shutdown hook, so a
# concurrently-running launch (the driver's bench included) can never
# lose spill files to this script. Leftover dirs from SIGKILL'd JVMs are
# swept only when no java process is alive (bounds disk between groups —
# within one app shuffle files live until context GC, which at 96 GB
# heap almost never fires; chunking is what bounds disk at sf100).
#
# PRIORITY ORDER: the 12 queries round 13 never landed at sf100 run
# FIRST (the dedup_ngram family died on scratch disk inside the shared
# dedup2 group JVM — each now runs SOLO with the whole scratch budget;
# the heavy tail rode r12-iso fallbacks), then the families that carry
# fresh r13 numbers re-land so the round-14 artifact is one coherent
# same-code sweep. Queries measured by r14_sf100_followups.sh (the d3
# outlier solos, the media faces, dedup_simhash, text_quality) are NOT
# repeated here — merge_sf100.py consumes both dirs' JSONs.
# Usage: r14_sf100_sweep.sh  (run inside tmux; writes /tmp/sf100_groups)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/sf100_groups
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf100
export SPARK_DRIVER_MEM=96g
export GRAFT_BENCH_REPS=1
export GRAFT_BENCH_TRACE=1

sweep_leftovers() {
  if ! pgrep -x java > /dev/null; then
    rm -rf /tmp/graft-local.* 2>/dev/null || true
  fi
}

run_group() { # name csv [timeout_sec]
  local name="$1" csv="$2" tmo="${3:-7200}"
  if [ -s "$OUT/$name.json" ] && ! grep -q '"n_failed":[1-9]' "$OUT/$name.json"; then
    echo "=== group $name SKIP (already landed clean)"
    return
  fi
  sweep_leftovers
  echo "=== group $name start $(date +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
  GRAFT_BENCH_ONLY="$csv" GRAFT_BENCH_OUT="$OUT/$name.json" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "$OUT/$name.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

# --- the 12 queries with no round-13 sf100 number run FIRST ---
# dedup_ngram family: died on disk in the SHARED dedup2 JVM — solo each
run_group r14_dedup_ngram dedup_ngram 3600
run_group r14_dedup_ngram_ppjoin dedup_ngram_ppjoin 3600
run_group r14_dedup_substring dedup_substring 3600
run_group r14_dedup_ngram_clusters dedup_ngram_clusters 3600
run_group r14_dedup_ngram_clusters_t50 dedup_ngram_clusters_t50 3600
# the r12-iso heavy tail, solo (dedup_simhash + text_quality live in
# r14_sf100_followups.sh)
run_group r14_pipeline_filtered pipeline_filtered_docs 3600
run_group r14_pipeline_training pipeline_training_manifest 3600
run_group r14_pipeline_curriculum pipeline_curriculum_manifest 3600
run_group r14_crd curation_replay_decontam 3600
run_group r14_dedup_simhash_clusters dedup_simhash_clusters 3600

# --- families re-landing fresh round-14 numbers ---
run_group market "cube_stats,cum_volume,daily_ohlcv,daily_stats,distinct_counts,enriched_by_segment,event_gaps,ewma_prices,except_tokens,inactive_tokens,json_props,latest_prices_topk,latest_tick,mode_conditional,percentiles,pivot_counts,price_jumps,quantile_sketch,quantile_sketch_adaptive,range_join_errors,rank_by_day,rollup_stats,scaled_projection,seq_dedup,session_stats,session_window_agg,set_ops,tick_returns,time_format,time_range_scan,token_freshness,token_stats,tokens_by_type,volume_profile,vwap_daily,zorder_key" 5400
run_group media_60_solo "media_phash_dedup" 2400
run_group media_scans "multimodal_meta,multimodal_format_stats,multimodal_frames,multimodal_resize" 2400
run_group ann "ann_lsh_topk,ann_lsh_multiprobe,ann_lsh_multitable,ann_ivf_topk,ann_ivf_nprobe2,ann_pq_topk,ann_pq_rerank,ann_ivfpq_topk,ann_ivfpq_residual,ann_sq_topk,ann_sq_rerank" 5400
run_group relmisc "asof_join,asof_price,brand_revenue,charset_stats,cross_source_dups,cms_heavy_hitters,corpus_drift,chunk_documents,cluster_balanced_sample,contrastive_pairs,contrastive_hard_negatives" 5400
run_group bpe "bpe_top_pairs,bpe_merges,bpe_encode,bpe_fertility" 3600
run_group bm25 "bm25_topk,bm25_multi,bm25_incremental" 2400
run_group tpch "tpch_pricing_summary,supplier_summary,revenue_by_region" 2400
run_group text1 "text_fingerprints,text_lang_id,text_lang_stats,text_redact,text_repetition,text_token_counts,stratified_sample,dataset_card,quality_rules" 5400
run_group mixing "temperature_mix,quota_sample,weighted_sample,weighted_sample_threshold,epoch_repeat,pack_shards_bpe,shuffle_shards,rendezvous_shards,token_counts_bpe" 5400
run_group vectors "similarity_topk,label_centroids,embedding_near_dup,embedding_outliers,semantic_clusters,hybrid_rrf,hybrid_rrf_ann,rag_context,mmr_rerank,knn_label_propagation" 5400
run_group dedup1 "dedup_exact,dedup_exact_normalized,dedup_minhash,dedup_minhash_clusters,dedup_minhash_est,dedup_keep_best,simhash_sigs" 5400
run_group dedup2 "dedup_cluster_histogram,leakage_free_split" 3600
run_group graph "pagerank_neardup,triangle_stats,cross_modal" 2400
run_group decontam "decontamination,decontamination_ngram,decontamination_bloom,decontamination_semantic" 3600
run_group text2 "text_perplexity,text_perplexity_bigram,tfidf_keywords,pmi_collocations,distinct_ngram_diversity,ngram_dup_profile,hll_gram_cardinality,memorization_risk,domain_reweight,quality_classifier,curriculum_assign,importance_sample" 5400
run_group vcr_solo "vector_curation_replay" 1200
run_group curation_replay_solo "curation_replay" 2400
sweep_leftovers
echo "SWEEP DONE $(date +%H:%M:%S)"
