#!/usr/bin/env bash
# Round-14 isolated re-measurement pass (the r13 noise protocol,
# scripts/remeasure_merge.py): the FINAL/SF1/SF10 suite windows carried
# sustained 1.5-3.8x risers on queries whose implementing files are
# BYTE-IDENTICAL to round 13 (verified per-query via git log --stat
# before listing them here) and whose cross-decade siblings are flat —
# the signature of window load, not plan change. Each set re-runs solo
# on the idle box at the suite's own reps and merges with provenance.
# Media-family queries are EXCLUDED: their implementing files changed
# this round (wide-gate migration), so their new numbers stand as
# measured and the shift is documented in SCALING.md instead.
# Usage: r14_remeasure.sh  (after r14_bench_chain.sh; idle box)
set -uo pipefail
cd "$(dirname "$0")/.."

merge() { # artifact rerun why
  python3 - "$1" "$2" "$3" <<'EOF'
import json, sys
rer = json.load(open(sys.argv[2]))
rer["remeasure_reason"] = sys.argv[3]
json.dump(rer, open(sys.argv[2], "w"))
EOF
  python3 scripts/remeasure_merge.py "$1" "$2"
}

WHY="isolated idle-box re-run: suite-window load riser on byte-identical code (cross-decade siblings flat)"

echo "== FINAL set (sf0.1 reps3)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  GRAFT_BENCH_ONLY="quantile_sketch_adaptive,quantile_sketch,quality_rules,quota_sample,quality_classifier,dedup_minhash,dedup_minhash_clusters,dedup_minhash_est,dataset_card,contrastive_pairs,contrastive_hard_negatives,pagerank_neardup" \
  GRAFT_BENCH_OUT=/tmp/remeasure_final.json scripts/run_main.sh graft.Bench \
  > /tmp/remeasure_final.log 2>&1
echo "exit=$?"
merge docs/BENCH_R14_FINAL.json /tmp/remeasure_final.json "$WHY"

echo "== SF1 set (reps3)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  GRAFT_BENCH_ONLY="dedup_cluster_histogram,token_counts_bpe,dedup_exact,token_entropy,tfidf_keywords,dedup_exact_normalized,decontamination_bloom,text_token_counts,chunk_documents" \
  GRAFT_BENCH_OUT=/tmp/remeasure_sf1.json scripts/run_main.sh graft.Bench \
  > /tmp/remeasure_sf1.log 2>&1
echo "exit=$?"
merge docs/BENCH_R14_SF1.json /tmp/remeasure_sf1.json "$WHY"

# PROVENANCE CAVEAT (r15, per ADVICE): this SF10 set re-ran at reps=2
# while BENCH_R14_SF10 itself was measured at reps=1 — merged mins for
# these four queries come from a deeper-sample basis than the rest of
# the artifact, whose top-level `reps` field still reads 1. Recorded
# here rather than re-run: the r15 protocol (contention gate + canary +
# single-window chains) replaces post-hoc remeasure merges entirely.
echo "== SF10 set (reps2)"
SPARK_DRIVER_MEM=48g GRAFT_BENCH_REPS=2 SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
  GRAFT_BENCH_ONLY="except_tokens,distinct_ngram_diversity,contrastive_hard_negatives,dedup_simhash" \
  GRAFT_BENCH_OUT=/tmp/remeasure_sf10.json scripts/run_main.sh graft.Bench \
  > /tmp/remeasure_sf10.log 2>&1
echo "exit=$?"
merge docs/BENCH_R14_SF10.json /tmp/remeasure_sf10.json "$WHY"

echo "REMEASURE DONE $(date +%H:%M:%S)"
