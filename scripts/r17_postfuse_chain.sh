#!/usr/bin/env bash
# Round-17 POST-FUSE measurement chain (optimization round 1). The
# previous session archived the pre-fuse suite artifacts
# (docs/r17/*_PREFUSE.json) after landing the fused TextStatsExpr
# projection; the box was then reset, wiping the /tmp corpora. This
# chain re-lands everything on HEAD code, most-valuable-first, each
# stage skip-if-clean so a wall-truncated chain leaves a valid prefix:
#   1. FINAL suite (sf0.1 — the driver's own bench scale; needs only
#      the read-only testdata)
#   2. corpus regeneration (deterministic, byte-identical decades)
#   3. SF1 suite, 4. SF10 suite (reps 1)
#   5. sf100 sweep (changed hot paths only; merge with carry-forward)
# Strictly serial; GRAFT_STRICT_LOAD=1 refuses to measure a busy box.
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
    > "/tmp/bench_${name}_r17pf.log" 2>&1
  echo "$name exit=$? $(date +%H:%M:%S)"
}

# 1. FINAL at the driver's bench scale — the headline post-fuse number
suite final /root/testdata/sf0.1 48g 3 docs/BENCH_R17_FINAL.json

# 2. regenerate the derived decades (deterministic generators)
scripts/r14_gen_corpora.sh

# 3-4. the two mid decades
suite sf1 /tmp/graft_sf1 48g 3 docs/BENCH_R17_SF1.json
suite sf10 /tmp/graft_sf10 48g 1 docs/BENCH_R17_SF10.json

# 5. sf100: changed hot paths only, one JVM per query, then merge
scripts/r17_sf100_sweep.sh

echo "R17 POSTFUSE CHAIN DONE $(date +%H:%M:%S)"
