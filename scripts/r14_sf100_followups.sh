#!/usr/bin/env bash
# Round-14 sf100 follow-ups, under the round-14 spill discipline:
# NO script sets SPARK_LOCAL_DIRS and NOTHING rm -rf's a shared root —
# every JVM makes its own /tmp/graft-local.* sibling dir
# (GraftConf.privateLocalDirs) and deletes it in a shutdown hook, so a
# concurrently-running launch (the driver's bench included) can never
# lose its spill files to this script. Leftover dirs from SIGKILL'd
# JVMs are swept only when no java process is alive.
#
# Covers (round-13 verdict):
#  #2  the migrated WIDE media gate measured at sf100 (plus the mixed-
#      population faces, verdict #6)
#  #4  the seven d3 outliers re-measured solo with reps>=2
#  #3  the two still-unmeasured retries with bigger budgets
# Usage: r14_sf100_followups.sh  (run inside tmux; appends /tmp/sf100_groups)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/sf100_groups
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf100
export SPARK_DRIVER_MEM=96g
export GRAFT_BENCH_TRACE=1

if ! pgrep -x java > /dev/null; then
  rm -rf /tmp/graft-local.* 2>/dev/null || true
fi

run_solo() { # name query [timeout_sec] [reps]
  local name="$1" q="$2" tmo="${3:-2400}" reps="${4:-2}"
  if [ -s "$OUT/$name.json" ] && ! grep -q '"n_failed":[1-9]' "$OUT/$name.json"; then
    echo "=== $name SKIP (already landed clean)"
    return
  fi
  echo "=== $name start $(date +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
  GRAFT_BENCH_REPS="$reps" GRAFT_BENCH_ONLY="$q" GRAFT_BENCH_OUT="$OUT/$name.json" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "$OUT/$name.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

# verdict #4: the seven d3 outliers, solo, reps 2
run_solo r14_token_entropy token_entropy 1200 2
run_solo r14_tpch_top_orders tpch_top_orders 1200 2
run_solo r14_hourly_bars hourly_bars 1200 2
run_solo r14_length_buckets length_buckets 1200 2
run_solo r14_pack_shards pack_shards 1200 2
run_solo r14_corpus_drift_deciles corpus_drift_deciles 1200 2
run_solo r14_token_histogram token_histogram 1200 2

# verdict #2 + #6: the migrated wide gate + the mixed faces
run_solo r14_media_replay media_curation_replay 2400 1
run_solo r14_media_replay_mixed media_curation_replay_mixed 2400 1
run_solo r14_media_wide media_phash_dedup_wide 1800 1
run_solo r14_media_mixed media_phash_dedup_mixed 1800 1

# verdict #3 leftovers: bigger budgets, one rep
run_solo r14_dedup_simhash dedup_simhash 3600 1
run_solo r14_text_quality text_quality 3600 1

echo "R14 FOLLOWUPS DONE $(date +%H:%M:%S)"
