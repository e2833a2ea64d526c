#!/usr/bin/env bash
# Round-16 sf100 group set: the queries whose sf100 numbers must be
# FRESH this round — the simhash family, whose candidate banding became
# auto-sized (TextDedup.simhashBandBits; at current unique-sig counts
# the layout is bit-identical to r15's fixed 4x12, so this re-measure
# doubles as the no-regression proof), plus the SimhashProbe band
# histogram at sf10 AND sf100 — the "per-bucket population ~flat per
# decade" evidence the auto law is graded on. All other queries'
# r15 sf100 numbers stand (code unchanged on their hot paths) and enter
# the merged artifact as the seed, now EXPLICITLY listed in
# carried_forward (ADVICE r15 #1):
#   python3 scripts/merge_sf100.py docs/BENCH_R15_SF100.json \
#     /tmp/sf100_r16_merge docs/BENCH_R16_SF100.json
# Solo-JVM discipline throughout (96 GB heap, private spill dirs,
# live-CPU contention gate). Skip-if-clean, so re-running is a no-op.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/sf100_r16_merge
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf100
export SPARK_DRIVER_MEM=96g
export GRAFT_BENCH_REPS=1
export GRAFT_BENCH_TRACE=1
export GRAFT_STRICT_LOAD=1

sweep_leftovers() {
  if ! pgrep -x java > /dev/null; then
    rm -rf /tmp/graft-local.* 2>/dev/null || true
  fi
}

run_group() { # name csv [timeout_sec]
  local name="$1" csv="$2" tmo="${3:-3600}"
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

# the production simhash face under the auto-banded candidate stage
run_group r16_dedup_simhash_clusters dedup_simhash_clusters 5400

# band-population histograms (not bench queries — probe tool): sf10
# then sf100, the two-decade flatness table for SCALING.md
if [ ! -s "$OUT/probe_sf10.log" ]; then
  sweep_leftovers
  SPARK_DRIVER_MEM=48g timeout 3600 scripts/run_main.sh graft.tools.SimhashProbe \
    /tmp/graft_sf10 3 > "$OUT/probe_sf10.log" 2>&1
  echo "probe_sf10 exit=$?"
fi
if [ ! -s "$OUT/probe_sf100.log" ]; then
  sweep_leftovers
  SPARK_DRIVER_MEM=96g timeout 7200 scripts/run_main.sh graft.tools.SimhashProbe \
    /tmp/graft_sf100 3 > "$OUT/probe_sf100.log" 2>&1
  echo "probe_sf100 exit=$?"
fi

echo "R16 SF100 SWEEP DONE $(date +%H:%M:%S)"
