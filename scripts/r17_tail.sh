#!/usr/bin/env bash
# Round-17 tail: runs after r17_bench_chain.sh + r17_sf100_sweep.sh.
# Ordered most-valuable-first, each stage skip-if-clean, so a
# wall-truncated tail still leaves a valid prefix. Strictly serial;
# nothing else may run beside it (measurement protocol).
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1
OUT=/tmp/r17_tail
mkdir -p "$OUT"

sweep() { if ! pgrep -x java > /dev/null; then rm -rf /tmp/graft-local.* 2>/dev/null || true; fi; }

solo() { # out sfdir mem query [timeout] [reps]
  local out="$1" sfdir="$2" mem="$3" q="$4" tmo="${5:-3600}" reps="${6:-3}"
  if [ -s "$out" ] && ! grep -q '"n_failed":[1-9]' "$out"; then
    echo "=== solo $q SKIP"
    return
  fi
  sweep
  echo "=== solo $q start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM="$mem" GRAFT_BENCH_REPS="$reps" GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_SF_DIR="$sfdir" GRAFT_BENCH_ONLY="$q" GRAFT_BENCH_OUT="$out" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "${out%.json}.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

tool() { # log mem tool args...
  local log="$1" mem="$2"; shift 2
  if [ -s "$log" ]; then echo "=== $1 SKIP"; return; fi
  sweep
  echo "=== $1 start $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM="$mem" timeout 5400 scripts/run_main.sh "$@" > "$log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

# 1. name the dataset_card riser (VERDICT r16 "What's wrong" #1)
tool "$OUT/cardprobe_sf10.log" 48g graft.tools.CardProbe /tmp/graft_sf10

# 2. the three r17-sf10 single-rep risers, solo + canary
solo "$OUT/bm25_incremental.json" /tmp/graft_sf10 48g bm25_incremental
solo "$OUT/domain_reweight.json"  /tmp/graft_sf10 48g domain_reweight
solo "$OUT/dedup_simhash.json"    /tmp/graft_sf10 48g dedup_simhash 5400

# 3. media gate at a 10% real-image fraction (VERDICT r16 #6)
tool "$OUT/mediafrac_sf1.log" 48g graft.tools.MediaFracProbe /tmp/graft_sf1

# 4. writers-per-date sweep (VERDICT r16 #8, stretch): two JVMs
if [ ! -s "$OUT/backfill_w8.log" ]; then
  sweep
  GRAFT_WRITERS_PER_DATE=8 GRAFT_BENCH_OUT="$OUT/backfill_w8.json" SPARK_DRIVER_MEM=48g \
    timeout 5400 scripts/run_main.sh graft.tools.BackfillSweep /tmp/graft_backfill 20000000 5 \
    > "$OUT/backfill_w8.log" 2>&1
  echo "backfill_w8 exit=$? $(date +%H:%M:%S)"
fi
if [ ! -s "$OUT/backfill_w32.log" ]; then
  sweep
  GRAFT_WRITERS_PER_DATE=32 GRAFT_BENCH_OUT="$OUT/backfill_w32.json" SPARK_DRIVER_MEM=48g \
    timeout 5400 scripts/run_main.sh graft.tools.BackfillSweep /tmp/graft_backfill 20000000 5 \
    > "$OUT/backfill_w32.log" 2>&1
  echo "backfill_w32 exit=$? $(date +%H:%M:%S)"
fi
rm -rf /tmp/graft_backfill

# 5. regenerate the flagship plan dump on the new code
tool "$OUT/dumpplans.log" 16g graft.tools.DumpPlans

# 6. the level-1 band algebra at the FOURTH decade: forced level 1 over
# the sf100 corpus (3.5M unique sigs -> 16-bit buckets, avg pop ~53) —
# the only way to see the post-flip candidate-work regime before a
# >4.2M-unique-sig corpus exists. Diagnostic-pool query, solo JVM, 96g.
solo "$OUT/sf100_clusters_l1.json" /tmp/graft_sf100 96g dedup_simhash_clusters_l1 5400 1

echo "R17 TAIL DONE $(date +%H:%M:%S)"
