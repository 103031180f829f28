#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB on each
oracle SQL from Verify's oracle_sql.json and diff against the parquet
written by graft.Verify. Not part of the Scala library."""
import json, os, sys, glob
import duckdb
import pandas as pd

verify_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    # driver tables are single files; GenScale's sf1 tables are
    # Spark-written directories — glob those for DuckDB
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    if t == "events":
        # GenScale's sf1 events carry ts as raw INT64 nanos (no parquet
        # logical type); Spark reads them via nanosAsLong + div 1000 —
        # mirror that here so epoch_us(ts) oracles run at sf1 too
        (ts_type,) = [r[1] for r in con.execute("DESCRIBE events").fetchall()
                      if r[0] == "ts"]
        if ts_type == "BIGINT":
            con.execute("DROP VIEW events")
            con.execute(
                f"CREATE VIEW events AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) FROM '{src}'")

oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
# Optional per-oracle time budget (seconds, env ORACLE_TIMEOUT_SEC):
# some oracle SQL is deliberately quadratic (cross-join levenshtein /
# jaccard ground truths) and DuckDB-side cost at sf1 is NOT an engine
# failure — mark it oracle_timeout and keep going rather than wedging
# the whole sweep on one reference query.
timeout_sec = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0") or 0)
import threading

def run_oracle(sql):
    if timeout_sec <= 0:
        return con.execute(sql).fetchdf()
    timer = threading.Timer(timeout_sec, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).fetchdf()
    finally:
        timer.cancel()

ok, bad, timed_out = [], [], []
for name in sorted(oracle):
    files = glob.glob(f"{verify_dir}/{name}/*.parquet")
    if not files:
        bad.append((name, "NO SPARK OUTPUT"))
        continue
    print(f"... {name}", flush=True)
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        duck_df = run_oracle(oracle[name])
    except Exception as e:
        if "INTERRUPT" in str(e).upper() or "interrupted" in str(e).lower():
            timed_out.append(name)
        else:
            bad.append((name, f"EXEC FAIL: {e}"))
        continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        bad.append((name, f"SCHEMA: spark={sc} duck={dc}"))
        continue
    s = spark_df[sc].sort_values(sc).reset_index(drop=True)
    d = duck_df[sc].sort_values(sc).reset_index(drop=True)
    if len(s) != len(d):
        bad.append((name, f"ROWS: spark={len(s)} duck={len(d)}"))
        continue
    mism = []
    for c in sc:
        a, b = s[c], d[c]
        # int-vs-float dtype split = DuckDB HUGEINT (uncast sum) reaching
        # pandas as float64; values compare equal numerically here but the
        # driver's stringifying hash sees "1" vs "1.0" → red row (the r7
        # corpus_seqpack flake). Fail loudly so the oracle gets a CAST.
        if {a.dtype.kind, b.dtype.kind} == {"i", "f"}:
            mism.append(f"{c}: DTYPE spark={a.dtype} duck={b.dtype} "
                        f"(uncast HUGEINT? driver-hash mismatch risk)")
            continue
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            neq = ~((a.isna() & b.isna()) | (a == b))
            if neq.any():
                diff = (a[neq].astype(float) - b[neq].astype(float)).abs().max()
                mism.append(f"{c}: {int(neq.sum())} diff (max abs {diff:.3g})")
        else:
            an, bn = a.astype(str), b.astype(str)
            neq = an != bn
            if neq.any():
                i = neq.idxmax()
                mism.append(f"{c}: {int(neq.sum())} diff (e.g. {an[i]!r} vs {bn[i]!r})")
    if mism:
        bad.append((name, "; ".join(mism)))
    else:
        ok.append(name)

print(f"OK ({len(ok)}):", " ".join(ok))
print(f"BAD ({len(bad)}):")
for n, why in bad:
    print(f"  {n}: {why}")
if timed_out:
    print(f"ORACLE_TIMEOUT ({len(timed_out)}):", " ".join(timed_out))
# queries with no oracle: rows-only
ran = {g.split("/")[-1] for g in glob.glob(f"{verify_dir}/*") if not g.endswith(".json")}
rows_only = ran - set(oracle)
rows_only_counts = {}
for name in sorted(rows_only):
    files = glob.glob(f"{verify_dir}/{name}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    rows_only_counts[name] = n
    print(f"  rows-only {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
# optional third arg: write a driver-style json artifact
if len(sys.argv) > 3:
    art = {}
    for name in ok:
        art[name] = {"match": True, "err": None}
    for n, why in bad:
        art[n] = {"match": False, "err": why}
    for n in timed_out:
        art[n] = {"match": None, "err": "oracle_timeout"}
    for n, c in rows_only_counts.items():
        art[n] = {"match": None, "spark_rows": c, "err": "no_oracle"}
    with open(sys.argv[3], "w") as f:
        json.dump(art, f, indent=2, sort_keys=True)
    print(f"wrote {sys.argv[3]}")
