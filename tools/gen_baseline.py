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
lines.append("end of round 5 (2026-08-13) at round-5 HEAD under the")
lines.append("**fork-per-query, hash-materialized harness** (one fresh JVM per")
lines.append("query; warm = min of two in-JVM runs after an untimed session")
lines.append("warmup, cold = first timed run; the timing sink aggregates")
lines.append("bit_xor(xxhash64(struct(<all output columns>))) so column pruning")
lines.append("cannot skip benched expressions). These are the numbers \"within")
lines.append("2x\" is judged against in later rounds. NOT comparable to the")
lines.append("round-4 table for queries whose outputs count() used to prune —")
lines.append("q_percentiles/q_approx_percentile/dedup_ngram_jaccard & co. now")
lines.append("measure the expressions they always claimed to (up to ~8x higher,")
lines.append("honestly); nor to the round-2/3 shared-JVM tables at all.")
lines.append("")
lines.append("Variance (MEASURED over two full quiet runs at round-5 HEAD,")
lines.append("tools/bench_variance.py): totals 229.0 / 235.6 s; median per-query")
lines.append("warm ratio 1.08 between runs; 84/87 queries reproduce within 1.3x.")
lines.append("Treat a regression as real only if it reproduces across 2+ runs of")
lines.append("`graft.tools.Probe <query>` or `graft.Bench <query...>` — and only")
lines.append("on a QUIET machine: concurrent sbt/test runs visibly inflate")
lines.append("everything. ann_opq (~72 s) is constant-dominated (64x64")
lines.append("literal-matrix codegen + two codebook trainings on a fixed-size")
lines.append("contract corpus), not a scaling signal.")
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
