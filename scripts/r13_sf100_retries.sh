#!/usr/bin/env bash
# Round-13 sf100 continuation: (1) the five dedup_ngram-family queries
# that died on scratch disk inside the SHARED dedup2 group JVM re-run
# under the solo-JVM discipline the heavy class uses — one query per
# JVM, /tmp/spark-local wiped between queries, so each query's shuffle
# spill has the whole scratch budget and dies alone if it must;
# (2) the heavy-tail solos the priority-ordered sweep deferred (each
# has an r12-iso fallback, so these only improve the ladder).
# Usage: r13_sf100_retries.sh  (run inside tmux; appends /tmp/sf100_groups)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/sf100_groups
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf100
export SPARK_DRIVER_MEM=96g
export GRAFT_BENCH_REPS=1
export GRAFT_BENCH_TRACE=1
export SPARK_LOCAL_DIRS=/tmp/spark-local

run_solo() { # name query [timeout_sec]
  local name="$1" q="$2" tmo="${3:-2400}"
  if [ -s "$OUT/$name.json" ]; then
    echo "=== $name SKIP (already landed)"
    return
  fi
  rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
  echo "=== $name start $(date +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
  GRAFT_BENCH_ONLY="$q" GRAFT_BENCH_OUT="$OUT/$name.json" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "$OUT/$name.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

run_solo retry_dedup_ngram dedup_ngram 3600
run_solo retry_dedup_ngram_ppjoin dedup_ngram_ppjoin 3600
run_solo retry_dedup_substring dedup_substring 3600
run_solo retry_dedup_ngram_clusters dedup_ngram_clusters 3600
run_solo retry_dedup_ngram_clusters_t50 dedup_ngram_clusters_t50 3600
run_solo dedup_simhash_solo dedup_simhash 1800
run_solo text_quality_solo text_quality 2400
run_solo pipeline_filtered2 pipeline_filtered_docs 2400
run_solo pipeline_training2 pipeline_training_manifest 2400
run_solo pipeline_curriculum_solo pipeline_curriculum_manifest 2400
run_solo crd_solo curation_replay_decontam 3600
run_solo dedup_simhash_clusters_solo dedup_simhash_clusters 3600
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
echo "RETRIES DONE $(date +%H:%M:%S)"
