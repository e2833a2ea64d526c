#!/usr/bin/env bash
# Round-17 wave-2 measurements: the second fuse wave (NormTextExpr for
# dedup_exact_normalized; TextStatsExpr charset stats for charset_stats).
# Solos at sf10 + sf100 (the decades where the regex chains dominated),
# then the FINAL suite re-lands on HEAD so the durable artifact matches
# the committed code, then the sf100 merge re-runs with the two new
# fresh solos.
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1
OUT=/tmp/sf100_r17
mkdir -p "$OUT" /tmp/r17_wave2

sweep() { if ! pgrep -x java > /dev/null; then rm -rf /tmp/graft-local.* 2>/dev/null || true; fi; }

solo() { # out sfdir mem queries reps [timeout]
  local out="$1" sfdir="$2" mem="$3" q="$4" reps="$5" tmo="${6:-3600}"
  if [ -s "$out" ] && ! grep -q '"n_failed":[1-9]' "$out"; then
    echo "=== solo $q SKIP"; return
  fi
  sweep
  echo "=== solo $q start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM="$mem" GRAFT_BENCH_REPS="$reps" \
    SPARK_GRAFT_SF_DIR="$sfdir" GRAFT_BENCH_ONLY="$q" GRAFT_BENCH_OUT="$out" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "${out%.json}.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

# sf10 solos (reps 3)
solo /tmp/r17_wave2/dedup_exact_normalized_sf10.json /tmp/graft_sf10 48g dedup_exact_normalized 3
solo /tmp/r17_wave2/charset_stats_sf10.json /tmp/graft_sf10 48g charset_stats 3

# sf100 solos (reps 1, 96g, the sweep protocol) -> feed the merge
solo "$OUT/dedup_exact_normalized.json" /tmp/graft_sf100 96g dedup_exact_normalized 1 5400
solo "$OUT/charset_stats.json" /tmp/graft_sf100 96g charset_stats 1 5400

python3 scripts/merge_sf100.py docs/BENCH_R16_SF100.json \
  "$OUT" docs/BENCH_R17_SF100.json

# FINAL re-lands on HEAD (wave-2 code)
sweep
echo "=== FINAL wave2 start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  GRAFT_BENCH_OUT=/tmp/r17_wave2/BENCH_R17_FINAL_wave2.json timeout 10800 \
  scripts/run_main.sh graft.Bench > /tmp/r17_wave2/final_wave2.log 2>&1
echo "    exit=$? $(date +%H:%M:%S)"

echo "R17 WAVE2 MEASURE DONE $(date +%H:%M:%S)"
