#!/usr/bin/env bash
# Round-15 sf100 group set: the queries whose sf100 numbers must be
# FRESH this round — the forest-sparsified simhash cluster face (the
# r14 OOM fix), the d3-audit rows, and every cluster face whose
# contraction storage changed (serialized persists). All other queries'
# r14 sf100 numbers stand (code unchanged on their hot paths) and enter
# the merged artifact as the seed:
#   python3 scripts/merge_sf100.py docs/BENCH_R14_SF100.json \
#     /tmp/sf100_r15_merge docs/BENCH_R15_SF100.json
# Solo-JVM discipline throughout (96 GB heap, private spill dirs,
# live-CPU contention gate). Skip-if-clean like every chain script, so
# re-running after scripts/r15_measure.sh already landed the JSONs is
# a no-op.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/sf100_r15_merge
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

run_group r15_dedup_simhash_clusters dedup_simhash_clusters 5400
run_group r15_bpe_fertility bpe_fertility 3600
run_group r15_distinct_counts distinct_counts 3600
run_group r15_dedup_minhash_clusters dedup_minhash_clusters 3600
run_group r15_dedup_ngram_clusters dedup_ngram_clusters 3600
run_group r15_dedup_ngram_clusters_t50 dedup_ngram_clusters_t50 3600
run_group r15_semantic_clusters semantic_clusters 3600

echo "R15 SF100 SWEEP DONE $(date +%H:%M:%S)"
