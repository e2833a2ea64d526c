#!/usr/bin/env bash
# Round-17 suite chain. Runs AFTER the r17 code lands (the sf10 suite
# already ran first, on r16-HEAD code, per the r16 verdict's priority
# lesson). Strictly sequential; GRAFT_STRICT_LOAD=1 makes a busy box a
# hard failure; skip-if-clean per stage so a wall-truncated chain
# leaves a valid prefix.
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1

sweep_leftovers() {
  if ! pgrep -x java > /dev/null; then
    rm -rf /tmp/graft-local.* 2>/dev/null || true
  fi
}

suite() { # name sfdir mem reps out [timeout]
  local name="$1" sfdir="$2" mem="$3" reps="$4" out="$5" tmo="${6:-10800}"
  if [ -s "$out" ] && ! grep -q '"n_failed":[1-9]' "$out"; then
    echo "### $name SKIP (already landed clean)"
    return
  fi
  sweep_leftovers
  echo "### $name reps$reps start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) df=$(df --output=avail -BG / | tail -1)"
  SPARK_DRIVER_MEM="$mem" GRAFT_BENCH_REPS="$reps" SPARK_GRAFT_SF_DIR="$sfdir" \
    GRAFT_BENCH_OUT="$out" timeout "$tmo" scripts/run_main.sh graft.Bench \
    > "/tmp/bench_${name}_r17.log" 2>&1
  echo "$name exit=$? $(date +%H:%M:%S)"
}

suite final /root/testdata/sf0.1 48g 3 docs/BENCH_R17_FINAL.json
suite sf1 /tmp/graft_sf1 48g 3 docs/BENCH_R17_SF1.json

echo "R17 SUITE CHAIN DONE $(date +%H:%M:%S)"
