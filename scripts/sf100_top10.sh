#!/usr/bin/env bash
# Round-12 item 5: sf100 spot-check of the ladder's worst 100x-ratio queries.
# One query per JVM so a disk-heavy shuffle (dedup_simhash at sf100 filled the
# disk when the whole list shared one SparkContext) cannot take down the rest,
# and the spill dir is wiped between queries.
set -uo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/tmp/graft_sf100}"
OUT_DIR="${2:-/tmp/sf100_parts}"
MEM="${SPARK_DRIVER_MEM:-96g}"
shift 2 || true
QUERIES=("$@")
[ ${#QUERIES[@]} -eq 0 ] && QUERIES=(dedup_simhash pmi_collocations text_quality \
  pipeline_filtered_docs pipeline_training_manifest pipeline_curriculum_manifest \
  vector_curation_replay)
mkdir -p "$OUT_DIR"
export SPARK_LOCAL_DIRS=/tmp/spark-local
for q in "${QUERIES[@]}"; do
  echo "=== $q ($(date +%H:%M:%S), free: $(df -BG --output=avail / | tail -1 | tr -d ' '))"
  rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
  SPARK_DRIVER_MEM="$MEM" GRAFT_BENCH_REPS=1 GRAFT_BENCH_ONLY="$q" \
    SPARK_GRAFT_SF_DIR="$SF_DIR" GRAFT_BENCH_OUT="$OUT_DIR/$q.json" \
    scripts/run_main.sh graft.Bench > "$OUT_DIR/$q.log" 2>&1
  echo "    exit=$? $(tail -c 200 "$OUT_DIR/$q.json" 2>/dev/null || echo 'NO OUTPUT')"
done
# recreate, never delete-last: a later run inheriting the exported
# SPARK_LOCAL_DIRS must find the directory present (round-12 verdict #1)
rm -rf /tmp/spark-local && mkdir -p /tmp/spark-local
echo "ALL DONE $(date +%H:%M:%S)"
