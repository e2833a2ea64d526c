#!/usr/bin/env bash
# Round-16 tail orchestrator v3 — final reprioritization (19:58, the
# 32k training still in its merge loop): the driver's own per-round
# bench already produces the sf0.1 artifact (now parseable + canaried),
# so the tail's UNIQUE evidence leads: the sf100 simhash solo (auto-band
# no-regression + cold wall) and the two-decade band-population
# histograms, then FINAL, then everything else. Skip-if-clean stages;
# the wall cuts where it cuts.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[tail3] waiting for Bpe32k to exit ($(date +%H:%M:%S)) ..."
while pgrep -f graft.tools.Bpe32k > /dev/null; do sleep 15; done
echo "[tail3] Bpe32k exited $(date +%H:%M:%S); draining 45 s"
sleep 45
export GRAFT_STRICT_LOAD=1
OUT=/tmp/sf100_r16_merge
mkdir -p "$OUT"

sweep() { if ! pgrep -x java > /dev/null; then rm -rf /tmp/graft-local.* 2>/dev/null || true; fi; }

# 1. sf100 simhash clusters solo (the auto-band cold wall)
if [ ! -s "$OUT/r16_dedup_simhash_clusters.json" ]; then
  sweep
  echo "[tail3] simhash solo start $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=96g GRAFT_BENCH_REPS=1 GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 GRAFT_BENCH_ONLY=dedup_simhash_clusters \
    GRAFT_BENCH_OUT="$OUT/r16_dedup_simhash_clusters.json" \
    timeout 5400 scripts/run_main.sh graft.Bench > "$OUT/r16_dedup_simhash_clusters.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
fi

# 2. band-population histograms: sf10 (fast) then sf100
if [ ! -s "$OUT/probe_sf10.log" ]; then
  sweep
  SPARK_DRIVER_MEM=48g timeout 1800 scripts/run_main.sh graft.tools.SimhashProbe \
    /tmp/graft_sf10 3 > "$OUT/probe_sf10.log" 2>&1
  echo "[tail3] probe_sf10 exit=$? $(date +%H:%M:%S)"
fi
if [ ! -s "$OUT/probe_sf100.log" ]; then
  sweep
  SPARK_DRIVER_MEM=96g timeout 3600 scripts/run_main.sh graft.tools.SimhashProbe \
    /tmp/graft_sf100 3 > "$OUT/probe_sf100.log" 2>&1
  echo "[tail3] probe_sf100 exit=$? $(date +%H:%M:%S)"
fi

# 3. merged sf100 artifact (fresh simhash + r15 seed, carried_forward explicit)
python3 scripts/merge_sf100.py docs/BENCH_R15_SF100.json \
  "$OUT" docs/BENCH_R16_SF100.json 2>&1 | tee /tmp/r16_merge.log

# 4. FINAL suite, then the remaining chains
scripts/r16_bench_chain.sh   2>&1 | tee /tmp/r16_chain.log
scripts/r16_ingest_measure.sh 2>&1 | tee /tmp/r16_ingest.log
scripts/r16_sf10_suite.sh    2>&1 | tee /tmp/r16_sf10.log

echo "[tail3] ALL DONE $(date +%H:%M:%S)"
