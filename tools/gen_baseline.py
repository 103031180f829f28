#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query table from BENCH.out.json
(fork-per-query harness). Not part of the Scala library."""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "BENCH.out.json"
j = json.load(open(src))
qs, cold = j["queries"], j["queries_cold"]
total = sum(qs.values())

lines = []
lines.append("# BASELINE — graft bench reference numbers")
lines.append("")
lines.append("Per-query times for `graft.Bench` at **sf0.1, local[32]**, recorded")
lines.append("end of round 4 (2026-08-12) at round-4 HEAD under the")
lines.append("**fork-per-query harness** (one fresh JVM per query; warm = min of")
lines.append("two in-JVM runs after an untimed session warmup, cold = first timed")
lines.append("run). These are the numbers \"within 2x\" is judged against in later")
lines.append("rounds. The round-2/3 tables were measured in ONE shared JVM, which")
lines.append("the round-3 judge showed contaminates shuffle-heavy queries up to")
lines.append("3.6x — numbers below are NOT comparable to those tables, only to")
lines.append("future fork-per-query runs.")
lines.append("")
lines.append("Variance (MEASURED over three full quiet runs at round-4 HEAD,")
lines.append("tools/bench_variance.py): common-query totals 125.0 / 117.7 /")
lines.append("114.1 s; median per-query warm ratio 1.09 between runs; 72/78")
lines.append("queries reproduce within 1.3x; the worst real-query excursions are")
lines.append("MLlib LinearSVC (~1.5-1.9x) and sub-second queries at the 0.3-0.8 s")
lines.append("measurement floor. Treat a regression as real only if it reproduces")
lines.append("across 2+ runs of `graft.tools.Probe <query>` or")
lines.append("`graft.Bench <query...>` — and only on a QUIET machine: concurrent")
lines.append("sbt/test runs visibly inflate everything.")
lines.append("")
lines.append(f"Total warm: **{total:.1f} s** across {len(qs)} queries.")
lines.append("")
lines.append("| query | warm s | cold s |")
lines.append("|---|---|---|")
for name in sorted(qs):
    lines.append(f"| {name} | {qs[name]:.2f} | {cold[name]:.2f} |")
lines.append("")
open("BASELINE.md", "w").write("\n".join(lines) + "\n")
print(f"wrote BASELINE.md: {len(qs)} queries, total {total:.1f}s")
