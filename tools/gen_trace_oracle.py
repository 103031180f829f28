#!/usr/bin/env python3
"""Generate literal-pinned DuckDB oracle SQL for the deterministic SMO
training traces (round-10 verdict item 1). Reads the trace parquet that
graft.Verify dumped at each scale factor and emits one VALUES-pinned
SQL per query:

  - svm_cascade_train_rbf trains on the SF-independent RingData slice,
    so its pin is a single unconditional VALUES block;
  - cascade/bagging/iterative train on the embeddings table, so their
    pins carry one VALUES block per scale factor, selected by
    (SELECT count(*)*100000 + sum(label) FROM embeddings) — a composite
    key because sf0.001 and sf0.01 share a row count (500) with
    different content; an unknown corpus yields zero rows, i.e. a LOUD
    mismatch, never a silent pass.

Not part of the Scala library; a builder tool like compare_oracle.py.
Usage: gen_trace_oracle.py out.scala key1=path1 key2=path2 ...
  (each path is a Verify outDir; each key is that corpus's
   count(*)*100000 + sum(label) over embeddings)
"""
import sys, glob
import pandas as pd

QUERIES = ["svm_cascade_train", "svm_bagging_train", "svm_iterative_train",
           "svm_cascade_train_rbf"]
SF_FREE = {"svm_cascade_train_rbf"}


def load(outdir, q):
    files = sorted(glob.glob(f"{outdir}/{q}/*.parquet"))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.sort_values(["stage", "layer", "subset"]).reset_index(drop=True)


def lit(v, col):
    if col == "stage":
        return "'" + str(v) + "'"
    if col == "metric":
        return repr(float(v))  # shortest round-trip decimal → same double
    return str(int(v))


def values_rows(df, sfc=None):
    cols = ["stage", "layer", "subset", "n_in", "n_sv", "metric"]
    rows = []
    for _, r in df.iterrows():
        vals = ", ".join(lit(r[c], c) for c in cols)
        rows.append(f"  ({vals}{', ' + str(sfc) if sfc is not None else ''})")
    return rows


def sql_for(q, per_sf):
    head = ("SELECT stage, CAST(layer AS INTEGER) AS layer, "
            "CAST(subset AS INTEGER) AS subset,\n"
            "  CAST(n_in AS BIGINT) AS n_in, CAST(n_sv AS BIGINT) AS n_sv, "
            "CAST(metric AS DOUBLE) AS metric\nFROM t")
    if q in SF_FREE:
        df = next(iter(per_sf.values()))
        body = ",\n".join(values_rows(df))
        return (f"WITH t(stage, layer, subset, n_in, n_sv, metric) AS (VALUES\n"
                f"{body})\n{head}")
    blocks = []
    for sfc, df in sorted(per_sf.items()):
        blocks.extend(values_rows(df, sfc))
    body = ",\n".join(blocks)
    return (f"WITH t(stage, layer, subset, n_in, n_sv, metric, sfc) AS (VALUES\n"
            f"{body})\n{head}\n"
            "WHERE sfc = (SELECT count(*)*100000 + sum(label) FROM embeddings)")


def scala_string(s):
    esc = s.replace("\\", "\\\\").replace('"', '\\"')
    lines = esc.split("\n")
    return '"""' + "\n      |".join(lines) + '""".stripMargin'


def main():
    out = sys.argv[1]
    dirs = {}
    for arg in sys.argv[2:]:
        k, v = arg.split("=", 1)
        dirs[int(k)] = v
    chunks = []
    for q in QUERIES:
        per_sf = {}
        for sfc, d in dirs.items():
            df = load(d, q)
            if df is not None:
                per_sf[sfc] = df
        if not per_sf:
            print(f"SKIP {q}: no trace parquet found", file=sys.stderr)
            continue
        sql = sql_for(q, per_sf)
        chunks.append(f'    "{q}" ->\n      {scala_string(sql)},\n')
        print(f"{q}: pinned {sum(len(df) for df in per_sf.values())} rows "
              f"across {len(per_sf)} SF block(s)")
    with open(out, "w") as f:
        f.writelines(chunks)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
