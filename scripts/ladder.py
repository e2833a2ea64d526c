#!/usr/bin/env python3
"""Render the two-decade scaling-ladder markdown table from three Bench
JSONs (sf0.1, sf1, sf10). Rows sorted by the 100x ratio descending;
harness-pool queries flagged (their cost model is batch count, not
corpus); queries noisy in ANY run flagged so readers discount them.

Usage: ladder.py BENCH_sf0.1.json BENCH_sf1.json BENCH_sf10.json
"""
import json, sys

def load(p):
    return json.load(open(p))

def main(p01, p1, p10):
    b01, b1, b10 = load(p01), load(p1), load(p10)
    harness = set(b10.get("harness", []))
    noisy = set(b01.get("noisy", [])) | set(b1.get("noisy", [])) | set(b10.get("noisy", []))
    qs = sorted(set(b01["queries"]) & set(b1["queries"]) & set(b10["queries"]))
    rows = []
    for q in qs:
        t01, t1, t10 = b01["queries"][q], b1["queries"][q], b10["queries"][q]
        if min(t01, t1, t10) < 0:
            continue
        notes = []
        if q in harness:
            notes.append("harness")
        if q in noisy:
            notes.append("noisy")
        rows.append((q, t01, t1, t10, t1 / t01, t10 / t01, " ".join(notes)))
    rows.sort(key=lambda r: -r[5])
    print("| query | sf0.1 s | sf1 s | sf10 s | 10x | 100x | note |")
    print("|---|---|---|---|---|---|---|")
    for q, t01, t1, t10, r10x, r100x, note in rows:
        print(f"| {q} | {t01:.3f} | {t1:.3f} | {t10:.3f} | {r10x:.1f}x | {r100x:.1f}x | {note} |")
    n_super = sum(1 for r in rows if r[5] > 200 and "harness" not in r[6])
    print(f"\n{len(rows)} queries; >2x-linear (ratio > 200) probe rows: {n_super}",
          file=sys.stderr)

if __name__ == "__main__":
    main(*sys.argv[1:4])
