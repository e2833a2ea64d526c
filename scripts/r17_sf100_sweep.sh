#!/usr/bin/env bash
# Round-17 sf100 re-measures: ONLY the changed hot paths (provenance
# protocol — everything else carries forward from BENCH_R16_SF100 with
# explicit carried_forward entries). Changed this round: the simhash
# banding stage (block-combination law replacing the r16 overlap law —
# level 0 output bit-identical, so this is a no-regression re-land).
# One JVM per query; 96g; JVM-private spill dirs.
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1
OUT=/tmp/sf100_r17
mkdir -p "$OUT"

sweep() { if ! pgrep -x java > /dev/null; then rm -rf /tmp/graft-local.* 2>/dev/null || true; fi; }

run_solo() { # name queries [timeout]
  local name="$1" qs="$2" tmo="${3:-5400}"
  if [ -s "$OUT/$name.json" ] && ! grep -q '"n_failed":[1-9]' "$OUT/$name.json"; then
    echo "=== $name SKIP (already landed clean)"
    return
  fi
  sweep
  echo "=== $name start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
  SPARK_DRIVER_MEM=96g GRAFT_BENCH_REPS=1 GRAFT_BENCH_TRACE=1 \
    SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 GRAFT_BENCH_ONLY="$qs" \
    GRAFT_BENCH_OUT="$OUT/$name.json" \
    timeout "$tmo" scripts/run_main.sh graft.Bench > "$OUT/$name.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
}

run_solo dedup_simhash_clusters dedup_simhash_clusters

# second wave: every consumer of the quality/langId projections, whose
# hot loop moved into the fused single-pass TextStatsExpr this round
# (r17 CardProbe profiling: the old three-regex + lower/split
# formulation was ~2 ms/doc and dominated these queries' sf100 cost)
run_solo text_quality text_quality 3600
run_solo quality_rules quality_rules 3600
run_solo text_lang_id text_lang_id 3600
run_solo dedup_keep_best dedup_keep_best 5400
run_solo dataset_card dataset_card 5400
run_solo pipeline_filtered_docs pipeline_filtered_docs 5400
run_solo pipeline_training_manifest pipeline_training_manifest 5400
run_solo pipeline_curriculum_manifest pipeline_curriculum_manifest 5400

python3 scripts/merge_sf100.py docs/BENCH_R16_SF100.json \
  "$OUT" docs/BENCH_R17_SF100.json

echo "R17 SF100 SWEEP DONE $(date +%H:%M:%S)"
