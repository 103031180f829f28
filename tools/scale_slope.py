#!/usr/bin/env python3
"""Per-query scaling slopes from two Bench artifacts (sf0.1 vs sf1).

Usage: scale_slope.py <bench_sf01.json> <bench_sf1.json>

Prints a markdown table of warm times and the 10x-growth ratio per
query. A ratio near 10 is linear; far above is super-linear (or a
contract whose probe count also scales — see the ann_* note in
BASELINE.md).
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    print("| query | sf0.1 warm (s) | sf1 warm (s) | ratio (10x data) |")
    print("|---|---|---|---|")
    for q in sorted(qa):
        # -1 is the harness's failure sentinel; a 0.0 would also make the
        # ratio meaningless, so treat any non-positive time as FAILED.
        if q not in qb or qa[q] <= 0 or qb[q] <= 0:
            print(f"| {q} | {qa.get(q)} | {qb.get(q)} | FAILED |")
            continue
        ratio = qb[q] / qa[q]
        print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
