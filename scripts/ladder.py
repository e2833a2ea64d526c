#!/usr/bin/env python3
"""Render the scaling-ladder markdown table from three or four Bench
JSONs (sf0.1, sf1, sf10[, sf100]). Rows sorted by the last ratio
descending; harness-pool queries flagged (their cost model is batch
count, not corpus); queries noisy in ANY run flagged so readers
discount them; queries failed/absent at sf100 rendered with an em-dash
so the 3-decade data still shows.

Usage: ladder.py BENCH_sf0.1.json BENCH_sf1.json BENCH_sf10.json [BENCH_sf100.json]
"""
import json, sys

def load(p):
    return json.load(open(p))

def main(p01, p1, p10, p100=None):
    b01, b1, b10 = load(p01), load(p1), load(p10)
    b100 = load(p100) if p100 else None
    harness = set(b10.get("harness", []))
    # diagnostic pool (r15): known-quadratic sample-scale faces — kept in
    # the ladder for visibility but flagged and excluded from the
    # >2x-linear probe count exactly like harness rows
    diagnostic = set()
    for b in (b01, b1, b10, b100):
        if b:
            diagnostic |= set(b.get("diagnostic", []))
    noisy = set(b01.get("noisy", [])) | set(b1.get("noisy", [])) | set(b10.get("noisy", []))
    if b100:
        noisy |= set(b100.get("noisy", []))
    qs = sorted(set(b01["queries"]) & set(b1["queries"]) & set(b10["queries"]))
    rows = []
    for q in qs:
        t01, t1, t10 = b01["queries"][q], b1["queries"][q], b10["queries"][q]
        if min(t01, t1, t10) < 0:
            continue
        t100 = b100["queries"].get(q, -1.0) if b100 else None
        notes = []
        if q in harness:
            notes.append("harness")
        if q in diagnostic:
            notes.append("diagnostic")
        if q in noisy:
            notes.append("noisy")
        last = (t100 / t01) if (t100 is not None and t100 >= 0) else (t10 / t01)
        rows.append((q, t01, t1, t10, t100, t1 / t01, t10 / t01, last, " ".join(notes)))
    rows.sort(key=lambda r: -r[7])
    if b100:
        print("| query | sf0.1 s | sf1 s | sf10 s | sf100 s | 10x | 100x | 1000x | d3 (sf100/sf10) | note |")
        print("|---|---|---|---|---|---|---|---|---|---|")
        for q, t01, t1, t10, t100, r10, r100, _, note in rows:
            if t100 is not None and t100 >= 0:
                print(f"| {q} | {t01:.3f} | {t1:.3f} | {t10:.3f} | {t100:.3f} "
                      f"| {r10:.1f}x | {r100:.1f}x | {t100 / t01:.0f}x | {t100 / t10:.1f}x | {note} |")
            else:
                print(f"| {q} | {t01:.3f} | {t1:.3f} | {t10:.3f} | — "
                      f"| {r10:.1f}x | {r100:.1f}x | — | — | {note} |")
    else:
        print("| query | sf0.1 s | sf1 s | sf10 s | 10x | 100x | note |")
        print("|---|---|---|---|---|---|---|")
        for q, t01, t1, t10, _, r10, r100, _, note in rows:
            print(f"| {q} | {t01:.3f} | {t1:.3f} | {t10:.3f} | {r10:.1f}x | {r100:.1f}x | {note} |")
    n_super = sum(1 for r in rows
                  if r[6] > 200 and "harness" not in r[8] and "diagnostic" not in r[8])
    print(f"\n{len(rows)} queries; >2x-linear (100x ratio > 200) probe rows: {n_super}",
          file=sys.stderr)

if __name__ == "__main__":
    main(*sys.argv[1:5])
