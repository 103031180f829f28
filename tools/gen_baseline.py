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
lines.append("Variance: fresh-JVM per-query times reproduce within roughly ±30%")
lines.append("run-to-run on this host (MLlib LinearSVC and the k-means builds")
lines.append("swing the most; sub-second queries sit near the ~0.3-0.5 s")
lines.append("measurement floor of a cold session). Treat a regression as real")
lines.append("only if it reproduces across 2+ runs of `graft.tools.Probe <query>`")
lines.append("or `graft.Bench <query...>` — and only on a QUIET machine:")
lines.append("concurrent sbt/test runs visibly inflate everything.")
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
