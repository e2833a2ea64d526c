#!/usr/bin/env bash
# Round-17 post-chain arbitration: the post-fuse FINAL/SF1 windows
# showed scattered non-fuse-related risers (bpe_top_pairs 0.28->2.48 at
# sf0.1; bm25_incremental, tfidf_keywords, decontamination at sf1) with
# healthy canaries — the same pattern r15-r17 repeatedly traced to
# window pollution. Solo re-measures (reps 3, own JVM) arbitrate code
# vs window; then FINAL re-runs in the quietest window of the session
# (it is the driver-scale artifact, worth a second sample).
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1
OUT=/tmp/r17_recheck
mkdir -p "$OUT"

sweep() { if ! pgrep -x java > /dev/null; then rm -rf /tmp/graft-local.* 2>/dev/null || true; fi; }

solo() { # out sfdir mem queries [reps]
  local out="$1" sfdir="$2" mem="$3" q="$4" reps="${5:-3}"
  if [ -s "$out" ] && ! grep -q '"n_failed":[1-9]' "$out"; then
    echo "=== solo $q SKIP"
    return
  fi
  sweep
  echo "=== solo $q start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM="$mem" GRAFT_BENCH_REPS="$reps" \
    SPARK_GRAFT_SF_DIR="$sfdir" GRAFT_BENCH_ONLY="$q" GRAFT_BENCH_OUT="$out" \
    timeout 3600 scripts/run_main.sh graft.Bench > "${out%.json}.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

# sf0.1 risers
solo "$OUT/bpe_top_pairs_sf01.json" /root/testdata/sf0.1 16g bpe_top_pairs
solo "$OUT/bm25_incremental_sf01.json" /root/testdata/sf0.1 16g bm25_incremental
solo "$OUT/curation_replay_sf01.json" /root/testdata/sf0.1 16g curation_replay
# sf1 risers
solo "$OUT/bm25_incremental_sf1.json" /tmp/graft_sf1 24g bm25_incremental
solo "$OUT/tfidf_keywords_sf1.json" /tmp/graft_sf1 24g tfidf_keywords
solo "$OUT/decontamination_sf1.json" /tmp/graft_sf1 24g decontamination
solo "$OUT/ann_ivfpq_residual_sf1.json" /tmp/graft_sf1 24g ann_ivfpq_residual

# sf10 risers (reps 1 suite values; solo reps 3 arbitrates)
solo "$OUT/decontamination_bloom_sf10.json" /tmp/graft_sf10 48g decontamination_bloom
solo "$OUT/distinct_ngram_diversity_sf10.json" /tmp/graft_sf10 48g distinct_ngram_diversity

# FINAL re-run, fresh window (second sample of the driver-scale suite)
sweep
echo "=== FINAL rerun start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  GRAFT_BENCH_OUT="$OUT/BENCH_R17_FINAL_rerun.json" timeout 10800 \
  scripts/run_main.sh graft.Bench > "$OUT/final_rerun.log" 2>&1
echo "    exit=$? $(date +%H:%M:%S)"

echo "R17 RECHECK DONE $(date +%H:%M:%S)"
