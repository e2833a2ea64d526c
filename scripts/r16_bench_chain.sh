#!/usr/bin/env bash
# Round-16 suite chain (r15 verdict #8): the lower-decade durable
# artifacts, every one carrying `canary_sec` (Bench records it since
# r15; these are the FIRST durable artifacts with it, so r17's
# compare_bench.py canary normalization has a baseline on both sides).
# Bench samples the live /proc/stat CPU busy fraction at start
# (GraftConf.checkBenchContention, threshold GRAFT_MAX_BUSY=0.25) and
# with GRAFT_STRICT_LOAD=1 a busy box is a hard failure. Strictly
# sequential; NOTHING else (sbt, tests, generators, the BPE trainer)
# may run during it. Spill discipline: JVM-private /tmp/graft-local.*
# dirs; leftovers swept only when no java process is alive.
# Prereqs: /tmp/graft_sf{1,10} exist (scripts/r14_gen_corpora.sh).
#
# PRIORITY ORDER: the round's long pole (the 32k BPE training) ends
# late, so the chain is ordered most-valuable-first and each suite is
# skip-if-clean — a wall-truncated chain still leaves a valid prefix.
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
  if [ -s "$out" ] && ! grep -q '"n_failed":[1-9]' "$out"; then
    echo "### $name SKIP (already landed clean)"
    return
  fi
  sweep_leftovers
  echo "### $name reps$reps start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) df=$(df --output=avail -BG / | tail -1)"
  SPARK_DRIVER_MEM="$mem" GRAFT_BENCH_REPS="$reps" SPARK_GRAFT_SF_DIR="$sfdir" \
    GRAFT_BENCH_OUT="$out" timeout "$tmo" scripts/run_main.sh graft.Bench \
    > "/tmp/bench_${name}.log" 2>&1
  echo "$name exit=$? $(date +%H:%M:%S)"
}

solo() { # out sfdir mem query [timeout]
  local out="$1" sfdir="$2" mem="$3" q="$4" tmo="${5:-3600}"
  if [ -s "$out" ] && ! grep -q '"n_failed":[1-9]' "$out"; then
    echo "=== solo $q SKIP (already landed clean)"
    return
  fi
  sweep_leftovers
  echo "=== solo $q start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM="$mem" GRAFT_BENCH_REPS=3 GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_SF_DIR="$sfdir" GRAFT_BENCH_ONLY="$q" GRAFT_BENCH_OUT="$out" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "${out%.json}.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

suite final /root/testdata/sf0.1 48g 3 docs/BENCH_R16_FINAL.json
suite sf1 /tmp/graft_sf1 48g 3 docs/BENCH_R16_SF1.json

# the three unexplained r15 sf10 risers (verdict #5), re-measured solo
# BESIDE a canary reading so environment-vs-code is data, not narrative
mkdir -p /tmp/sf10_r16
solo /tmp/sf10_r16/epoch_repeat.json      /tmp/graft_sf10 48g epoch_repeat
solo /tmp/sf10_r16/dataset_card.json      /tmp/graft_sf10 48g dataset_card
solo /tmp/sf10_r16/text_fingerprints.json /tmp/graft_sf10 48g text_fingerprints

# the full sf10 suite lives in r16_sf10_suite.sh — it is the LOWEST
# priority artifact (r15's is recent and canary normalization makes it
# comparable), so the round-tail orchestrator runs it last

echo "R16 SUITE CHAIN DONE $(date +%H:%M:%S)"
