#!/usr/bin/env bash
# Round-15 solo measurement chain (runs BEFORE the suite chain so the
# suite windows stay quiet). Three jobs:
#  A. sf10 solo re-measures for the d3-basis reconciliation the r14
#     verdict asked for (#5): dedup_simhash (26.3 s vs 14.61 s two-basis
#     question), bpe_fertility + distinct_counts (the two >15x d3 rows
#     the r14 outlier audit skipped), plus dedup_simhash_clusters under
#     the new forest-sparsified code.
#  B. sf100 solos: the two audit rows again, plus the four cluster
#     queries whose contraction storage changed in r15 (serialized
#     persists) — their r14 numbers are for superseded code.
#  C. the sustained-ingest throughput run (verdict #6).
# Every query gets its OWN JVM (the r13 51 GB shuffle-accumulation
# lesson) with JVM-private spill dirs. Sequential; nothing else should
# run on the box — Bench's loadavg gate enforces that at each start.
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1  # builder chains: busy box = hard failure
OUT=/tmp/sf100_r15
mkdir -p "$OUT"

sweep_leftovers() {
  if ! pgrep -x java > /dev/null; then
    rm -rf /tmp/graft-local.* 2>/dev/null || true
  fi
}

run_solo() { # outprefix sfdir mem reps query [timeout]
  local prefix="$1" sfdir="$2" mem="$3" reps="$4" q="$5" tmo="${6:-3600}"
  local name="${prefix}_${q}"
  if [ -s "$OUT/$name.json" ] && ! grep -q '"n_failed":[1-9]' "$OUT/$name.json"; then
    echo "=== $name SKIP (already landed clean)"
    return
  fi
  sweep_leftovers
  echo "=== $name start $(date +%H:%M:%S) df=$(df --output=avail -BG / | tail -1) load=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM="$mem" GRAFT_BENCH_REPS="$reps" GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_SF_DIR="$sfdir" GRAFT_BENCH_ONLY="$q" \
    GRAFT_BENCH_OUT="$OUT/$name.json" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "$OUT/$name.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

# --- A: sf10 solo re-measures (reps 2: a warm rep pair, min reported) ---
run_solo r15sf10 /tmp/graft_sf10 48g 2 dedup_simhash 1800
run_solo r15sf10 /tmp/graft_sf10 48g 2 dedup_simhash_clusters 1800
run_solo r15sf10 /tmp/graft_sf10 48g 2 bpe_fertility 1800
run_solo r15sf10 /tmp/graft_sf10 48g 2 distinct_counts 1800

# --- B: sf100 solos ---
run_solo r15sf100 /tmp/graft_sf100 96g 1 bpe_fertility 3600
run_solo r15sf100 /tmp/graft_sf100 96g 1 distinct_counts 3600
run_solo r15sf100 /tmp/graft_sf100 96g 1 dedup_minhash_clusters 3600
run_solo r15sf100 /tmp/graft_sf100 96g 1 dedup_ngram_clusters 3600
run_solo r15sf100 /tmp/graft_sf100 96g 1 dedup_ngram_clusters_t50 3600
run_solo r15sf100 /tmp/graft_sf100 96g 1 semantic_clusters 3600

# --- C: sustained ingest throughput (3 min paced at 10k ticks/s) ---
sweep_leftovers
echo "=== ingest_throughput start $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=16g GRAFT_BENCH_OUT="$OUT/ingest_throughput.json" \
  timeout 1800 scripts/run_main.sh graft.tools.IngestThroughput \
  /tmp/graft_ingest_tp 10000 180 50 > "$OUT/ingest_throughput.log" 2>&1
echo "    exit=$? $(date +%H:%M:%S)"

echo "R15 MEASURE CHAIN DONE $(date +%H:%M:%S)"
