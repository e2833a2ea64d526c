#!/usr/bin/env python3
"""Merge an isolated re-measurement run into a bench artifact.

When in-run noisy detection (or cross-decade inconsistency) shows a
suite run was polluted by box load, the affected queries are re-run
alone on an idle box (GRAFT_BENCH_ONLY=..., same SF dir, same reps) and
this script replaces JUST those entries, recomputes the totals, drops
replaced names from `noisy`, and records the provenance in `remeasured`
so the artifact says exactly which numbers came from the follow-up run.

Usage: remeasure_merge.py BENCH_X.json remeasure.json
(updates BENCH_X.json in place)
"""
import json, sys


def main(base_path, re_path):
    base = json.load(open(base_path))
    rer = json.load(open(re_path))
    replaced = {}
    for q, t in rer["queries"].items():
        if t < 0:
            raise SystemExit(f"re-measurement of {q} itself failed; not merging")
        replaced[q] = {"was": base["queries"].get(q), "now": t}
        base["queries"][q] = t
        if "queries_max" in base and q in rer.get("queries_max", {}):
            base["queries_max"][q] = rer["queries_max"][q]
        if "queries_runs" in base and q in rer.get("queries_runs", {}):
            base["queries_runs"][q] = rer["queries_runs"][q]
    base["noisy"] = [q for q in base.get("noisy", []) if q not in replaced]
    # a re-measured query is no longer a failure: drop it from errors
    # and recompute n_failed, mirroring the `noisy` cleanup above
    if "errors" in base:
        base["errors"] = {q: m for q, m in base["errors"].items()
                          if q not in replaced}
        base["n_failed"] = len(base["errors"])
    harness = set(base.get("harness", []))
    vals = base["queries"]
    base["value"] = round(sum(t for t in vals.values() if t >= 0), 3)
    base["total_probe"] = round(
        sum(t for q, t in vals.items() if t >= 0 and q not in harness), 3)
    base["total_harness"] = round(
        sum(t for q, t in vals.items() if t >= 0 and q in harness), 3)
    base["remeasured"] = {
        **base.get("remeasured", {}),
        **{q: {"was": round(v["was"], 3) if v["was"] is not None else None,
               "now": round(v["now"], 3),
               "why": rer.get("remeasure_reason", "isolated idle-box re-run")}
           for q, v in replaced.items()},
    }
    json.dump(base, open(base_path, "w"), indent=1)
    for q, v in replaced.items():
        print(f"  {q}: {v['was']} -> {v['now']}")
    print(f"merged {len(replaced)} re-measurements into {base_path}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
