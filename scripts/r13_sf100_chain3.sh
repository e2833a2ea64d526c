#!/usr/bin/env bash
# Round-13 sf100 chain, part 3: everything not yet measured this round
# and not covered by the round-12 isolated one-JVM-per-query sf100
# numbers (pipeline_{training,curriculum}_manifest, pipeline_filtered_
# docs, text_quality, dedup_{exact_normalized,keep_best,simhash},
# dedup_simhash_clusters, pmi_collocations, charset_stats — those carry
# their r12 measurements in the ladder, flagged as such).
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

# dedup1 ran in chain2 (incl. the two r12-covered extras)
run_group vectors "similarity_topk,label_centroids,embedding_near_dup,embedding_outliers,semantic_clusters,hybrid_rrf,hybrid_rrf_ann,rag_context,mmr_rerank,knn_label_propagation"
run_group dedup2 "dedup_ngram,dedup_ngram_clusters,dedup_ngram_clusters_t50,dedup_ngram_ppjoin,dedup_substring,leakage_free_split"
run_group mixing "temperature_mix,quota_sample,weighted_sample,weighted_sample_threshold,epoch_repeat,pack_shards,pack_shards_bpe,shuffle_shards,rendezvous_shards,token_counts_bpe"
run_group text2 "text_perplexity,text_perplexity_bigram,tfidf_keywords,distinct_ngram_diversity,ngram_dup_profile,hll_gram_cardinality,memorization_risk,domain_reweight,quality_classifier,curriculum_assign,importance_sample"
run_group graph "pagerank_neardup,triangle_stats,cross_modal"
run_group decontam "decontamination,decontamination_ngram,decontamination_bloom,decontamination_semantic"
run_group crd_solo "curation_replay_decontam" 3600
run_group media_replay_solo "media_curation_replay" 2400
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
echo "CHAIN3 DONE $(date +%H:%M:%S)"
