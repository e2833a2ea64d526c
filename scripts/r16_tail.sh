#!/usr/bin/env bash
# Round-16 tail orchestrator: waits for the 32k BPE JVM to exit, lets
# the box drain below the strict contention gate, then runs the round's
# measurement set most-valuable-first. Every stage is skip-if-clean, so
# a wall-truncated tail leaves a valid prefix and re-running resumes.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[tail] waiting for Bpe32k to exit ($(date +%H:%M:%S)) ..."
while pgrep -f graft.tools.Bpe32k > /dev/null; do sleep 30; done
echo "[tail] Bpe32k exited $(date +%H:%M:%S); draining 90 s"
sleep 90

scripts/r16_bench_chain.sh   2>&1 | tee /tmp/r16_chain.log
scripts/r16_sf100_sweep.sh   2>&1 | tee /tmp/r16_sweep.log
python3 scripts/merge_sf100.py docs/BENCH_R15_SF100.json \
  /tmp/sf100_r16_merge docs/BENCH_R16_SF100.json 2>&1 | tee /tmp/r16_merge.log
scripts/r16_ingest_measure.sh 2>&1 | tee /tmp/r16_ingest.log
scripts/r16_sf10_suite.sh    2>&1 | tee /tmp/r16_sf10.log

echo "[tail] ALL DONE $(date +%H:%M:%S)"
