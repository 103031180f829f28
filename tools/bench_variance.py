#!/usr/bin/env python3
"""Compare two fork-per-query BENCH.out.json runs and print per-query
warm-time ratios — evidence for BASELINE.md's variance statement."""
import json
import sys

a = json.load(open(sys.argv[1]))["queries"]
b = json.load(open(sys.argv[2]))["queries"]
common = sorted(set(a) & set(b))
ratios = []
for q in common:
    if a[q] > 0 and b[q] > 0:
        r = max(a[q], b[q]) / min(a[q], b[q])
        ratios.append((r, q, a[q], b[q]))
ratios.sort(reverse=True)
print(f"{len(common)} common queries; run1 total "
      f"{sum(a[q] for q in common):.1f}s vs run2 {sum(b[q] for q in common):.1f}s")
worst = ratios[:8]
print("worst run-to-run ratios:")
for r, q, x, y in worst:
    print(f"  {q:25s} {x:6.2f}s vs {y:6.2f}s  ratio {r:.2f}")
within = [t for t in ratios if t[0] <= 1.3]
print(f"{len(within)}/{len(ratios)} queries reproduce within 1.3x; "
      f"median ratio {sorted(r for r, *_ in ratios)[len(ratios)//2]:.2f}")
