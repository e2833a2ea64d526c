#!/usr/bin/env bash
# Round-15 suite chain: the three durable lower-decade ladder artifacts.
# Round-14 verdict #2 made contention-PREVENTION the default instead of
# post-hoc solo re-measures: Bench samples the live /proc/stat CPU busy
# fraction at start (GraftConf.checkBenchContention, default threshold
# 0.25 via GRAFT_MAX_BUSY) and with GRAFT_STRICT_LOAD=1 — exported
# below — a busy box is a hard failure, not a warning. This chain is
# strictly sequential, and NOTHING else (sbt, tests, generators) may
# run during it — the goal is an artifact set with `"noisy":[]` and no remeasure
# merge. Spill discipline: JVM-private /tmp/graft-local.* dirs
# (GraftConf.privateLocalDirs); leftovers swept only when no java
# process is alive.
# Prereqs: /tmp/graft_sf{1,10} exist (scripts/r14_gen_corpora.sh).
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1  # builder chains: busy box = hard failure

sweep_leftovers() {
  if ! pgrep -x java > /dev/null; then
    rm -rf /tmp/graft-local.* 2>/dev/null || true
  fi
}

suite() { # name sfdir mem reps out [timeout]
  local name="$1" sfdir="$2" mem="$3" reps="$4" out="$5" tmo="${6:-10800}"
  sweep_leftovers
  echo "### $name reps$reps start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) df=$(df --output=avail -BG / | tail -1)"
  SPARK_DRIVER_MEM="$mem" GRAFT_BENCH_REPS="$reps" SPARK_GRAFT_SF_DIR="$sfdir" \
    GRAFT_BENCH_OUT="$out" timeout "$tmo" scripts/run_main.sh graft.Bench \
    > "/tmp/bench_${name}.log" 2>&1
  echo "$name exit=$? $(date +%H:%M:%S)"
}

suite final /root/testdata/sf0.1 48g 3 docs/BENCH_R15_FINAL.json
suite sf1 /tmp/graft_sf1 48g 3 docs/BENCH_R15_SF1.json
suite sf10 /tmp/graft_sf10 48g 1 docs/BENCH_R15_SF10.json

echo "R15 SUITE CHAIN DONE $(date +%H:%M:%S)"
