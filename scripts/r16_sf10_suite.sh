#!/usr/bin/env bash
# Round-16 sf10 suite — split out of r16_bench_chain.sh as the round's
# LOWEST-priority artifact (the 32k BPE long pole compresses the
# measurement tail; r15's sf10 artifact is recent and the canary makes
# it comparable across rounds). Skip-if-clean like every chain script.
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1
out=docs/BENCH_R16_SF10.json
if [ -s "$out" ] && ! grep -q '"n_failed":[1-9]' "$out"; then
  echo "### sf10 SKIP (already landed clean)"
  exit 0
fi
if ! pgrep -x java > /dev/null; then rm -rf /tmp/graft-local.* 2>/dev/null || true; fi
echo "### sf10 reps1 start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=1 SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
  GRAFT_BENCH_OUT="$out" timeout 10800 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r16.log 2>&1
echo "sf10 exit=$? $(date +%H:%M:%S)"
