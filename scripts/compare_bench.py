#!/usr/bin/env python3
"""Round-over-round bench comparison that flags only CODE-ATTRIBUTABLE
regressions.

Round 7's driver bench showed four 3-4x "regressions" on queries whose
code was byte-identical to the previous round — pure box load. This
script separates the two failure modes:

  1. a query marked `noisy` by Bench's own spread detector (in either
     round) is excluded from regression verdicts outright;
  2. a slower query whose implementing source files did NOT change in
     the given git range is reported as "environmental", never as a
     regression.

Usage:
  python3 scripts/compare_bench.py OLD.json NEW.json [GIT_RANGE]
  python3 scripts/compare_bench.py --audit BENCH_OR_CORRECTNESS.json
      # fail if any query name resolves to DEFAULT_FILES without a
      # MARKET_WHITELIST row (attribution gap)

GIT_RANGE (e.g. "2c75a71..HEAD") scopes `git diff --name-only`; when
omitted, every query is treated as potentially code-attributable (no
exclusion by file).

Exit code 1 iff at least one code-attributable regression was found.
"""
import json
import subprocess
import sys

RATIO = 1.5          # min must slow by >= this factor ...
ABS_FLOOR = 0.10     # ... and by >= this many seconds, to count at all

# Query-name prefix -> the src/main/scala files that implement that
# family (beyond the global files every query shares). Kept coarse on
# purpose: a false "changed" only means we REPORT a regression that a
# human then reads; a false "unchanged" would hide one.
FAMILY_FILES = {
    ("tpch_", "revenue_", "brand_", "supplier_"): ["queries/RelationalQueries.scala"],
    # before the ("dedup_",) catch-all: substring dedup lives in its own file
    ("dedup_substring",): ["ops/SubstringDedup.scala", "ops/TextHashing.scala"],
    ("importance_sample",): ["ops/Importance.scala", "ops/TextHashing.scala"],
    ("quality_classifier",): ["ops/QualityClassifier.scala", "ops/Importance.scala",
                              "ops/TextHashing.scala"],
    # before the decontamination catch-all: the semantic flagger is an
    # embeddings operator, not a shingle one
    ("decontamination_semantic",): ["ops/Similarity.scala", "core/SessionCache.scala"],
    ("shuffle_shards",): ["ops/Mixing.scala", "ops/TextHashing.scala"],
    ("dataset_card",): ["ops/TextAnalysis.scala", "ops/TextDedup.scala",
                        "ops/TextHashing.scala", "ops/GraphOps.scala",
                        "core/SessionCache.scala"],
    ("contrastive_",): ["ops/TextDedup.scala", "ops/TextHashing.scala",
                        "ops/GraphOps.scala", "ops/Similarity.scala",
                        "core/SessionCache.scala"],
    ("knn_label_propagation", "mmr_rerank", "cluster_balanced_sample"): [
        "ops/Similarity.scala", "core/SessionCache.scala"],
    ("hll_gram_cardinality",): ["ops/TextAnalysis.scala", "ops/TextHashing.scala",
                                "ops/TextDedup.scala"],
    ("curriculum_assign", "token_entropy"): ["ops/TextAnalysis.scala",
                                             "ops/TextHashing.scala"],
    ("bpe_fertility",): ["ops/TextAnalysis.scala", "ops/TextHashing.scala"],
    ("domain_reweight", "corpus_drift", "length_buckets", "charset_stats"): [
        "ops/TextAnalysis.scala", "ops/TextHashing.scala"],
    ("price_jumps", "ewma_prices", "vwap_daily"): ["queries/MarketQueries.scala"],
    ("quantile_sketch",): ["ops/QuantileSketch.scala", "queries/MarketQueries.scala"],
    ("zorder_key",): ["queries/MarketQueries.scala", "storage/TickTable.scala"],
    ("ngram_dup_profile", "pagerank_neardup", "triangle_stats",
     "cross_source_dups", "memorization_risk"): [
        "ops/TextDedup.scala", "ops/TextHashing.scala", "ops/GraphOps.scala",
        "core/SessionCache.scala"],
    ("dedup_", "simhash_", "decontamination"): [
        "ops/TextDedup.scala", "ops/TextHashing.scala", "ops/GraphOps.scala",
        "core/SessionCache.scala"],
    ("ann_", "similarity_", "embedding_", "label_centroids", "semantic_clusters"): [
        "ops/Similarity.scala", "ops/ScalarQuant.scala", "ops/GraphOps.scala",
        "core/SessionCache.scala"],
    ("bm25_", "hybrid_", "rag_context"): [
        "ops/TextRanking.scala", "ops/Similarity.scala", "core/SessionCache.scala"],
    ("temperature_mix", "quota_sample", "weighted_sample", "pack_shards",
     "epoch_repeat", "rendezvous_shards"): ["ops/Mixing.scala"],
    ("text_", "token_histogram", "stratified_sample", "cross_modal",
     "chunk_documents", "bpe_", "tfidf_", "cms_", "pmi_",
     "distinct_ngram_diversity", "quality_rules", "token_counts_bpe"): [
        "ops/TextAnalysis.scala", "ops/TextHashing.scala"],
    ("leakage_free_split", "dedup_keep_best"): [
        "ops/TextDedup.scala", "ops/TextHashing.scala", "ops/GraphOps.scala",
        "core/SessionCache.scala"],
    # specific-before-generic: dict order resolves first match
    ("media_curation_replay",): ["ops/CurationPipeline.scala", "ops/Multimodal.scala"],
    ("multimodal_", "media_"): ["ops/Multimodal.scala"],
    ("pipeline_",): ["ops/CurationPipeline.scala", "ops/TextAnalysis.scala",
                     "ops/TextDedup.scala"],
    ("curation_replay",): ["ops/CurationPipeline.scala", "ops/TextDedup.scala",
                           "ops/TextHashing.scala"],
    ("vector_curation_replay",): ["ops/CurationPipeline.scala", "ops/Similarity.scala"],
}
# changes to these can shift ANY query
GLOBAL_FILES = ["SparkEntry.scala", "Bench.scala", "core/GraftConf.scala",
                "plans/"]
DEFAULT_FILES = ["queries/MarketQueries.scala", "queries/TickQueries.scala",
                 "ops/RangeJoin.scala", "ops/Skew.scala", "streaming/"]

# Queries ALLOWED to resolve to DEFAULT_FILES: the MarketQueries /
# TickQueries / AsofJoin / RangeJoin parity family. Any query name that
# falls through to DEFAULT_FILES *without* being listed here is an
# attribution gap — a regression in its real implementing file would be
# misclassified "environmental" under a GIT_RANGE. `--audit` enforces
# this: every new SparkEntry.queries name needs either a FAMILY_FILES
# prefix or an explicit row below.
MARKET_WHITELIST = {
    "asof_join", "asof_price", "cube_stats", "cum_volume", "daily_ohlcv",
    "daily_stats", "distinct_counts", "enriched_by_segment", "event_gaps",
    "except_tokens", "hourly_bars", "inactive_tokens", "json_props",
    "latest_prices_topk", "latest_tick", "mode_conditional", "percentiles",
    "pivot_counts", "range_join_errors", "rank_by_day", "rollup_stats",
    "scaled_projection", "seq_dedup", "session_stats", "session_window_agg",
    "set_ops",
    "tick_returns", "time_format", "time_range_scan", "token_freshness",
    "token_stats", "tokens_by_type", "volume_profile",
}


def family_files(query):
    for prefixes, files in FAMILY_FILES.items():
        if any(query.startswith(p) for p in prefixes):
            return files
    return DEFAULT_FILES


def audit(path):
    """Check every query name in a bench/correctness JSON resolves to a
    non-DEFAULT family or is whitelisted MarketQueries-family."""
    d = json.load(open(path))
    names = sorted(d["queries"]) if "queries" in d else sorted(d)
    gaps = [q for q in names
            if family_files(q) is DEFAULT_FILES and q not in MARKET_WHITELIST]
    if gaps:
        print(f"attribution gaps ({len(gaps)}): queries resolving to "
              "DEFAULT_FILES without a whitelist row:")
        for q in gaps:
            print(f"  {q}")
        sys.exit(1)
    print(f"attribution audit: all {len(names)} query names resolve "
          "(family or whitelisted)")
    sys.exit(0)


def changed_files(git_range):
    out = subprocess.check_output(
        ["git", "diff", "--name-only", git_range], text=True)
    return [l for l in out.splitlines() if l.endswith(".scala")]


def main():
    if len(sys.argv) == 3 and sys.argv[1] == "--audit":
        audit(sys.argv[2])
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    def load(path):
        d = json.load(open(path))
        if "queries" in d:
            return d  # Bench's own line
        # the driver's BENCH_r{N}.json wraps Bench's line under "parsed",
        # with the raw output (possibly front-truncated) under "tail"
        if d.get("parsed"):
            return d["parsed"]
        import re
        m = re.search(r'\{"metric".*\}', d.get("tail", ""))
        if m:
            return json.loads(m.group(0))
        sys.exit(f"{path}: no parseable bench line ('parsed' empty, 'tail' truncated)")

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    git_range = sys.argv[3] if len(sys.argv) > 3 else None
    changed = changed_files(git_range) if git_range else None

    # canary normalization (r15 verdict #5): both artifacts carry
    # `canary_sec`, the wall of an identical fixed-work probe (200M-row
    # hash/agg) run in the same JVM/window — their ratio measures the
    # BOX-SPEED shift between the two windows, which r15 showed moves
    # same-code queries both directions within one day. New times are
    # divided by the ratio before the slowdown math so verdicts compare
    # code, not environment. Missing canary on either side -> annotate
    # and compare raw (pre-r15 artifacts predate the canary).
    cal = 1.0
    if isinstance(old.get("canary_sec"), (int, float)) and \
       isinstance(new.get("canary_sec"), (int, float)) and old["canary_sec"] > 0:
        cal = new["canary_sec"] / old["canary_sec"]
        print(f"canary: old {old['canary_sec']:.3f}s -> new {new['canary_sec']:.3f}s "
              f"(box-speed ratio {cal:.2f}x; new times normalized by it)")
    else:
        print("canary: absent on one side — comparing RAW times "
              "(pre-canary artifact or canary disabled)")

    noisy = set(old.get("noisy", [])) | set(new.get("noisy", []))
    # a query that was healthy in OLD but now errors (t_new < 0) or is
    # gone entirely is the WORST regression — it must fail the verdict,
    # not be silently skipped by the slowdown math
    broken = sorted(
        q for q, t_old in old["queries"].items()
        if t_old >= 0 and new["queries"].get(q, -1.0) < 0)
    regressions, environmental, improved = [], [], []
    for q, t_raw in sorted(new["queries"].items()):
        t_old = old["queries"].get(q)
        if t_old is None or t_old < 0 or t_raw < 0:
            continue
        t_new = t_raw / cal  # canary-adjusted (cal=1.0 when no canary)
        if t_new <= t_old / RATIO and t_old - t_new >= ABS_FLOOR:
            improved.append((q, t_old, t_new))
            continue
        if t_new < t_old * RATIO or t_new - t_old < ABS_FLOOR:
            continue
        # slower beyond both thresholds — attribute it
        if q in noisy:
            environmental.append((q, t_old, t_new, "noisy box (Bench spread detector)"))
        elif changed is not None and not any(
                any(f.endswith(suf) or (suf.endswith("/") and suf in f)
                    for f in changed)
                for suf in family_files(q) + GLOBAL_FILES):
            environmental.append((q, t_old, t_new, "implementing files unchanged in range"))
        else:
            regressions.append((q, t_old, t_new))

    def show(title, rows):
        if not rows:
            return
        print(f"\n{title}:")
        for row in rows:
            q, t_old, t_new = row[0], row[1], row[2]
            why = f"  [{row[3]}]" if len(row) > 3 else ""
            print(f"  {q:32s} {t_old:7.3f}s -> {t_new:7.3f}s ({t_new / t_old:4.1f}x){why}")

    new_qs = set(new["queries"]) - set(old["queries"])
    print(f"old: {sys.argv[1]} total={old.get('value')}s  "
          f"new: {sys.argv[2]} total={new.get('value')}s  "
          f"(+{len(new_qs)} new queries)")
    # pool split: harness queries time index-construction replays whose
    # cost scales with batch count — their pool must not drown the probe
    # pool's signal. Older files without the tag fall back to the newer
    # file's list so round-over-round splits stay comparable.
    harness = set(new.get("harness", old.get("harness", [])))
    # diagnostic pool (r15): known-quadratic sample-scale faces, split
    # out the same way so probe totals measure only scale paths
    diagnostic = set(new.get("diagnostic", old.get("diagnostic", [])))
    if harness or diagnostic:
        def pools(d):
            ok = {q: t for q, t in d["queries"].items() if t >= 0}
            probe = sum(t for q, t in ok.items()
                        if q not in harness and q not in diagnostic)
            har = sum(t for q, t in ok.items() if q in harness)
            diag = sum(t for q, t in ok.items() if q in diagnostic)
            return probe, har, diag
        op, oh, od = pools(old)
        np_, nh, nd = pools(new)
        print(f"probe pool:   old {op:7.3f}s -> new {np_:7.3f}s ({np_ / op:4.2f}x)"
              if op else f"probe pool:   new {np_:7.3f}s")
        print(f"harness pool: old {oh:7.3f}s -> new {nh:7.3f}s ({nh / oh:4.2f}x)"
              f"  [{', '.join(sorted(harness))}]"
              if oh else f"harness pool: new {nh:7.3f}s")
        if diagnostic:
            print(f"diagnostic pool: old {od:7.3f}s -> new {nd:7.3f}s"
                  f"  [{', '.join(sorted(diagnostic))}]")
    if broken:
        print("\nBROKEN queries (healthy in old, error/missing in new):")
        for q in broken:
            t_new = new["queries"].get(q)
            state = "errored" if t_new is not None else "missing from new run"
            err = new.get("errors", {}).get(q, "")
            print(f"  {q:32s} {old['queries'][q]:7.3f}s -> {state}"
                  + (f"  [{err}]" if err else ""))
    adj = " (canary-adjusted)" if cal != 1.0 else ""
    show("CODE-ATTRIBUTABLE regressions" + adj, regressions)
    show("environmental slowdowns (excluded from verdict)" + adj, environmental)
    show("improvements" + adj, improved)
    if not regressions and not broken:
        print("\nverdict: no code-attributable regressions")
    sys.exit(1 if regressions or broken else 0)


if __name__ == "__main__":
    main()
