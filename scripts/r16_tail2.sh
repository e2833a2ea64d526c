#!/usr/bin/env bash
# Round-16 tail orchestrator v2 — reprioritized at 19:26 when the 32k
# training overran its ETA: the sf100 simhash evidence (verdict #2's
# remaining Done criterion — measured cold wall + band-population
# flatness vs sf10) moves AHEAD of the SF1 suite. Order:
#   FINAL (sf0.1, canary) -> sf100 sweep (simhash solo + probes) ->
#   merge -> SF1 -> sf10 risers -> ingest ceiling/recovery -> SF10.
# Every stage skip-if-clean; a wall-truncated tail leaves a valid
# prefix. NOTE: r16_bench_chain.sh runs FINAL+SF1+risers in ITS order,
# so FINAL-only is extracted here via the chain's skip-if-clean by
# calling the whole chain twice around the sweep.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[tail2] waiting for Bpe32k to exit ($(date +%H:%M:%S)) ..."
while pgrep -f graft.tools.Bpe32k > /dev/null; do sleep 20; done
echo "[tail2] Bpe32k exited $(date +%H:%M:%S); draining 60 s"
sleep 60

# stage 1: FINAL only (one suite, highest-value artifact)
bash -c '
set -uo pipefail
export GRAFT_STRICT_LOAD=1
if ! pgrep -x java > /dev/null; then rm -rf /tmp/graft-local.* 2>/dev/null || true; fi
out=docs/BENCH_R16_FINAL.json
if [ -s "$out" ] && ! grep -q "\"n_failed\":[1-9]" "$out"; then echo "FINAL SKIP"; exit 0; fi
echo "### final reps3 start $(date +%H:%M:%S) load=$(cut -d" " -f1 /proc/loadavg)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  GRAFT_BENCH_OUT="$out" timeout 3600 scripts/run_main.sh graft.Bench \
  > /tmp/bench_final_r16.log 2>&1
echo "final exit=$? $(date +%H:%M:%S)"
'

# stage 2: the verdict-#2 sf100 evidence
scripts/r16_sf100_sweep.sh 2>&1 | tee /tmp/r16_sweep.log
python3 scripts/merge_sf100.py docs/BENCH_R15_SF100.json \
  /tmp/sf100_r16_merge docs/BENCH_R16_SF100.json 2>&1 | tee /tmp/r16_merge.log

# stage 3: the rest of the lower-decade chain (FINAL inside it skips)
scripts/r16_bench_chain.sh 2>&1 | tee /tmp/r16_chain.log

# stage 4: ingest ceiling + recovery
scripts/r16_ingest_measure.sh 2>&1 | tee /tmp/r16_ingest.log

# stage 5: sf10 full suite (lowest priority)
scripts/r16_sf10_suite.sh 2>&1 | tee /tmp/r16_sf10.log

echo "[tail2] ALL DONE $(date +%H:%M:%S)"
