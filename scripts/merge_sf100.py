#!/usr/bin/env python3
"""Merge chunked sf100 runs into one Bench-shaped JSON: an optional
seed dict (a salvaged trace, or a prior round's queries used as
documented carry-forward) + every group JSON from the CHAINS scripts.
Group JSONs overwrite the seed; group-reported failures and chain-level
timeouts (missing JSON / missing query) surface in `errors` so
exclusions are explicit, never silent.

Usage: merge_sf100.py {seed.json|-} /tmp/sf100_groups docs/BENCH_R14_SF100.json
"""
import json, os, sys

HARNESS = ["bm25_incremental", "curation_replay", "curation_replay_decontam",
           "media_curation_replay", "media_curation_replay_mixed",
           "vector_curation_replay"]
# known-quadratic sample-scale faces, reported under total_diagnostic
# (r15 pool split + r16 dedup_simhash demotion, mirrors Bench.scala's
# diagnosticQueries)
DIAGNOSTIC = ["dedup_ngram_ppjoin", "media_phash_dedup", "dedup_simhash",
              "dedup_simhash_l1", "dedup_simhash_clusters_l1",
              "dedup_simhash_clusters_l2"]

# chain scripts whose run_group/run_solo lines define the set the
# CURRENT round expected to measure fresh. Current round ONLY: with the
# r16-ADVICE rule (a seeded query the chain expected fresh loses its
# seed when its group JSON never lands), listing prior rounds' chains
# here would strip the seed from every legitimately carried-forward
# query — prior chains defined prior rounds' expectations, and their
# results are exactly what the seed artifact carries.
CHAINS = ["r17_sf100_sweep.sh"]


def main(part1_path, groups_dir, out_path):
    queries, errors = {}, {}
    seeded = set()
    if part1_path != "-" and os.path.exists(part1_path):
        # a seed may be a bare {query: time} dict OR a full Bench
        # artifact — take its `queries` and apply the same t >= 0 filter
        # as group JSONs so a seed's -1 failure entries never sum into
        # totals (ADVICE r14)
        seed = json.load(open(part1_path))
        seed_qs = seed.get("queries", seed)
        queries.update({q: t for q, t in seed_qs.items()
                        if isinstance(t, (int, float)) and t >= 0})
        seeded = set(queries)
    fresh, canaries = set(), []
    for f in sorted(os.listdir(groups_dir)):
        if not f.endswith(".json"):
            continue
        d = json.load(open(os.path.join(groups_dir, f)))
        if isinstance(d.get("canary_sec"), (int, float)):
            canaries.append(d["canary_sec"])
        for q, t in d["queries"].items():
            if t >= 0:
                queries[q] = t
                fresh.add(q)
            else:
                errors[q] = d.get("errors", {}).get(q, "failed")
    # a later retry group (e.g. solo-JVM re-runs of queries that died on
    # shared-group scratch disk) supersedes an earlier recorded failure —
    # but ONLY a FRESH measurement suppresses the error (ADVICE r15 #1:
    # a seed value must never mask a fresh-run failure for code that may
    # have changed this round; such queries fall back to the error AND
    # lose the stale seed number)
    for q in list(errors):
        if q in seeded and q not in fresh:
            queries.pop(q, None)
    errors = {q: e for q, e in errors.items() if q not in fresh}
    # queries a group was supposed to run but whose JSON never landed
    # (chain timeout kills the JVM before GRAFT_BENCH_OUT is written)
    import re
    chain = "\n".join(
        open(os.path.join(os.path.dirname(__file__), c)).read() for c in CHAINS)
    for m in re.finditer(r'run_(?:group|solo) (\S+) "?([a-z0-9_,]+)"?(?: (\d+))?', chain):
        name, csv = m.group(1), m.group(2)
        if not os.path.exists(os.path.join(groups_dir, f"{name}.json")):
            for q in csv.split(","):
                # ADVICE r16 #2: a seeded query the chain EXPECTED to
                # re-measure is treated like a group-reported failure
                # when its group JSON never lands — drop the stale seed
                # and record the error, instead of silently carrying a
                # prior-round number for possibly-changed code
                if q not in fresh and q not in errors:
                    queries.pop(q, None)
                    errors[q] = f"group {name} produced no JSON (timeout/crash) — see {name}.log"
    total = sum(t for t in queries.values())
    probe = sum(t for q, t in queries.items()
                if q not in HARNESS and q not in DIAGNOSTIC)
    har = sum(t for q, t in queries.items() if q in HARNESS)
    diag = sum(t for q, t in queries.items() if q in DIAGNOSTIC)
    carried = sorted(q for q in queries if q in seeded and q not in fresh)
    out = {
        "metric": "total", "value": round(total, 3), "unit": "sec",
        "queries": {q: round(t, 3) for q, t in sorted(queries.items())},
        "total_probe": round(probe, 3), "total_harness": round(har, 3),
        "total_diagnostic": round(diag, 3),
        "harness": HARNESS, "diagnostic": DIAGNOSTIC, "reps": 1, "noisy": [],
        "errors": errors, "n_failed": len(errors),
        # seed-sourced numbers NOT re-measured this round (ADVICE r15 #1:
        # explicit, never silent) — readers must treat these as the
        # prior round's measurements of then-current code
        "carried_forward": carried,
        # representative fixed-work canary for cross-round normalization
        # (min across this run's group JVMs — the least-contended window)
        **({"canary_sec": round(min(canaries), 3)} if canaries else {}),
        "sf": "/tmp/graft_sf100",
        "note": ("chunked: one JVM per query/family group, heavy class "
                 "solo, under JVM-private spill dirs — a single-JVM "
                 "full-suite run accumulated 51 GB of shuffle files by "
                 "query 35; queries in `errors` are explicit exclusions, "
                 "and the SCALING.md ladder flags any carried-forward "
                 "numbers"),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"{len(queries)} measured, {len(errors)} failed/excluded -> {out_path}")
    for q, e in errors.items():
        print(f"  EXCLUDED {q}: {e}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
