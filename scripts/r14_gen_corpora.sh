#!/usr/bin/env bash
# Round-14 corpus (re)generation: /tmp was wiped at the round boundary,
# so the three derived decades and the Zipf BPE corpus are rebuilt from
# the read-only driver testdata. Deterministic generators — byte-
# identical corpora to round 13's (ScaleUpTestdata strides + ZipfCorpus
# splitmix both seed-fixed), so cross-round ladder comparisons stay
# like-for-like. No SPARK_LOCAL_DIRS, no shared-root rm -rf: every JVM
# owns a private /tmp/graft-local.* (GraftConf.privateLocalDirs).
# Usage: r14_gen_corpora.sh  (run inside tmux; ~30-45 min)
set -uo pipefail
cd "$(dirname "$0")/.."

# Skip flags key on EMBEDDINGS — the LAST table ScaleUpTestdata writes
# (lineitem is first: a mid-generation crash used to leave a partial
# corpus a rerun silently skipped, and sf100 could then build from a
# partial sf10). A nonzero generator exit now ABORTS the chain for the
# same reason: downstream decades must never see a partial upstream.
gen() { # label outflag cmd...
  local label="$1" flag="$2"; shift 2
  if [ -e "$flag" ]; then echo "=== $label SKIP (exists)"; return; fi
  echo "=== $label start $(date +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
  "$@" > "/tmp/gen_$label.log" 2>&1
  local rc=$?
  echo "    exit=$rc $(date +%H:%M:%S)"
  if [ "$rc" -ne 0 ]; then
    echo "ABORT: $label generator failed (rc=$rc) — downstream decades would build from a partial corpus. See /tmp/gen_$label.log" >&2
    exit "$rc"
  fi
}

gen zipf /tmp/graft_zipf/documents.parquet/_SUCCESS \
  env SPARK_DRIVER_MEM=16g scripts/run_main.sh graft.tools.ZipfCorpus \
    /tmp/graft_zipf 200000 100 30000 1.07 13
gen sf1 /tmp/graft_sf1/embeddings.parquet/_SUCCESS \
  env SPARK_DRIVER_MEM=24g scripts/run_main.sh graft.tools.ScaleUpTestdata \
    /tmp/graft_sf1 /root/testdata/sf0.1 10
gen sf10 /tmp/graft_sf10/embeddings.parquet/_SUCCESS \
  env SPARK_DRIVER_MEM=48g scripts/run_main.sh graft.tools.ScaleUpTestdata \
    /tmp/graft_sf10 /root/testdata/sf0.1 100
gen sf100 /tmp/graft_sf100/embeddings.parquet/_SUCCESS \
  env SPARK_DRIVER_MEM=80g scripts/run_main.sh graft.tools.ScaleUpTestdata \
    /tmp/graft_sf100 /tmp/graft_sf10 10 100
sync
echo "GEN DONE $(date +%H:%M:%S) df=$(df --output=avail -BG / | tail -1)"
