#!/usr/bin/env bash
# Round-13 bench chain: the durable per-decade ladder artifacts, then the
# full-registry sf100 sweep. Sequential so no two Spark JVMs contend
# (a timed query under a noisy neighbor reports load, not plan cost).
# Prereqs: /tmp/graft_sf1 (ScaleUpTestdata 10x sf0.1), /tmp/graft_sf10
# (100x sf0.1), /tmp/graft_sf100 (10x sf10, strideMul 100 — tick side
# included).
set -uo pipefail
cd "$(dirname "$0")/.."
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
export SPARK_LOCAL_DIRS=/tmp/spark-local

echo "### FINAL sf0.1 reps3 $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  GRAFT_BENCH_OUT=docs/BENCH_R13_FINAL.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_final.log 2>&1
echo "FINAL exit=$? $(date +%H:%M:%S)"

echo "### SF1 reps3 $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  GRAFT_BENCH_OUT=docs/BENCH_R13_SF1.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf1.log 2>&1
echo "SF1 exit=$? $(date +%H:%M:%S)"

rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
echo "### SF10 reps1 $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=1 SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
  GRAFT_BENCH_OUT=docs/BENCH_R13_SF10.json scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10.log 2>&1
echo "SF10 exit=$? $(date +%H:%M:%S)"

echo "### sf100 full-registry sweep $(date +%H:%M:%S)"
bash scripts/r13_sf100_sweep.sh 2>&1 | tee /tmp/sf100_sweep.log
# recreate, never delete-last (round-12 verdict #1)
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
echo "R13 CHAIN DONE $(date +%H:%M:%S)"
