#!/usr/bin/env bash
# Round-14 bench chain: the durable per-decade ladder artifacts, then
# the sf100 follow-ups (d3 outlier solos + media faces) and the full
# 154-query sf100 sweep, then the >=5k-merge BPE training. Sequential so
# no two Spark JVMs contend. Round-14 spill discipline throughout: no
# SPARK_LOCAL_DIRS, no shared-root rm -rf (GraftConf.privateLocalDirs).
# Prereqs: scripts/r14_gen_corpora.sh has landed /tmp/graft_sf{1,10,100}
# and /tmp/graft_zipf.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "### FINAL sf0.1 reps3 $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  GRAFT_BENCH_OUT=docs/BENCH_R14_FINAL.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_final.log 2>&1
echo "FINAL exit=$? $(date +%H:%M:%S)"

echo "### SF1 reps3 $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  GRAFT_BENCH_OUT=docs/BENCH_R14_SF1.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1.log 2>&1
echo "SF1 exit=$? $(date +%H:%M:%S)"

echo "### SF10 reps1 $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=1 SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
  GRAFT_BENCH_OUT=docs/BENCH_R14_SF10.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10.log 2>&1
echo "SF10 exit=$? $(date +%H:%M:%S)"

echo "### sf100 follow-ups (outlier solos, media faces) $(date +%H:%M:%S)"
bash scripts/r14_sf100_followups.sh 2>&1 | tee /tmp/sf100_followups.log

echo "### sf100 full-registry sweep $(date +%H:%M:%S)"
bash scripts/r14_sf100_sweep.sh 2>&1 | tee /tmp/sf100_sweep.log

echo "### BPE 5000-merge training on the Zipf corpus $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g timeout 5400 scripts/run_main.sh graft.tools.BpeRounds \
  /tmp/graft_zipf 5000 16 > /tmp/bpe5k.log 2>&1
echo "BPE exit=$? $(date +%H:%M:%S)"

echo "R14 CHAIN DONE $(date +%H:%M:%S)"
