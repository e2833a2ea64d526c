#!/usr/bin/env bash
# Round-17 sf10 suite — run FIRST this round (r16 lesson: the
# lowest-priority suite died at the wall; the judge asked for the
# replacement to land before any long pole). Measures r16-HEAD code;
# skip-if-clean like every chain script.
set -uo pipefail
cd "$(dirname "$0")/.."
export GRAFT_STRICT_LOAD=1
out=docs/BENCH_R17_SF10.json
if [ -s "$out" ] && ! grep -q '"n_failed":[1-9]' "$out"; then
  echo "### sf10 SKIP (already landed clean)"
  exit 0
fi
if ! pgrep -x java > /dev/null; then rm -rf /tmp/graft-local.* 2>/dev/null || true; fi
echo "### sf10 reps1 start $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=1 SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
  GRAFT_BENCH_OUT="$out" timeout 10800 scripts/run_main.sh graft.Bench \
  > /tmp/bench_sf10_r17.log 2>&1
echo "sf10 exit=$? $(date +%H:%M:%S)"
