#!/usr/bin/env bash
# Round-12 post-fix bench chain, run AFTER the correctness gate is green on
# the narrow-dedup change. Sequential so no two Spark JVMs contend:
#   1. sf100 rerun of the four queries the array_distinct fix touches
#   2. sf10 isolated per-query runs of the whole top-10 (same one-JVM-per-
#      query basis as the sf100 numbers, so the decade ratio is apples-to-
#      apples — the in-suite ladder shares session caches and undercounts
#      first-leg costs)
#   3. full suites: FINAL sf0.1 reps3, SF1 reps3, SF10 reps1
set -uo pipefail
cd "$(dirname "$0")/.."
TOP10=(charset_stats dedup_exact_normalized dedup_keep_best dedup_simhash \
  pipeline_curriculum_manifest pipeline_filtered_docs pipeline_training_manifest \
  pmi_collocations text_quality vector_curation_replay)
AFFECTED=(dedup_simhash dedup_keep_best pipeline_training_manifest pipeline_curriculum_manifest vector_curation_replay)

echo "### stage 1: sf100 rerun of affected queries $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=96g bash scripts/sf100_top10.sh /tmp/graft_sf100 /tmp/sf100_new "${AFFECTED[@]}"

echo "### stage 2: sf10 isolated top-10 $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g bash scripts/sf100_top10.sh /tmp/graft_sf10 /tmp/sf10_iso "${TOP10[@]}"

echo "### stage 3: full suites $(date +%H:%M:%S)"
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
export SPARK_LOCAL_DIRS=/tmp/spark-local
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  GRAFT_BENCH_OUT=docs/BENCH_R12_FINAL.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_final.log 2>&1
echo "FINAL exit=$? $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  GRAFT_BENCH_OUT=docs/BENCH_R12_SF1.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1.log 2>&1
echo "SF1 exit=$? $(date +%H:%M:%S)"
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=1 SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
  GRAFT_BENCH_OUT=docs/BENCH_R12_SF10.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10.log 2>&1
echo "SF10 exit=$? $(date +%H:%M:%S)"
# recreate, never delete-last (round-12 verdict #1: the stale exported
# SPARK_LOCAL_DIRS killed the next driver bench when this dir was gone)
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
echo "CHAIN DONE $(date +%H:%M:%S)"
