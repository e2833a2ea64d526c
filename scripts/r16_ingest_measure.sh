#!/usr/bin/env bash
# Round-16 ingest measurements (r15 verdict #7): the saturation CEILING
# (offer 4x the tracked 10k/s and read the measured drain — r15 proved
# 10k/s tracked exactly with 4.1 s mean batches, so headroom exists but
# was unmeasured) and BACKLOG RECOVERY (steady 10k/s, forced kill,
# 60 s dark, restart from the same checkpoint with a 4x catch-up
# admission cap; report drain rate + time-to-catch-up — the
# at-least-once counterpart of the reference's drop-on-full buffer).
# Quiet-box rules as every measured run; one JVM per measurement.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/ingest_r16
mkdir -p "$OUT"

if [ ! -s "$OUT/ceiling.json" ]; then
  echo "=== ceiling (offer 40k/s for 120 s) start $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=24g GRAFT_BENCH_OUT="$OUT/ceiling.json" \
    timeout 1800 scripts/run_main.sh graft.tools.IngestThroughput \
    /tmp/graft_ingest_ceiling 40000 120 50 > "$OUT/ceiling.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
fi

if [ ! -s "$OUT/recovery.json" ]; then
  echo "=== recovery (10k/s steady 60 s, 60 s stall, 4x catch-up) start $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=24g GRAFT_BENCH_OUT="$OUT/recovery.json" \
    timeout 1800 scripts/run_main.sh graft.tools.IngestRecovery \
    /tmp/graft_ingest_rec 10000 60 60 4 > "$OUT/recovery.log" 2>&1
  echo "    exit=$? $(date +%H:%M:%S)"
fi

echo "R16 INGEST MEASURE DONE $(date +%H:%M:%S)"
cat "$OUT/ceiling.json" "$OUT/recovery.json" 2>/dev/null
