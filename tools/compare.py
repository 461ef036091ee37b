#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle gate.

Usage: python3 tools/compare.py [sfDir] [outDir]
Runs each oracle SQL from outDir/oracle_sql.json in DuckDB over the
parquet tables in sfDir, loads the Spark result parquet written by
graft.Verify, sorts columns by name + rows by all values, and compares.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    # normalize timestamp resolution (ns vs us) but keep every other dtype
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracle):
    spark_files = glob.glob(f"{out}/{name}/*.parquet")
    if not spark_files:
        print(f"MISSING  {name}: no spark result"); fails += 1; continue
    try:
        got = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))
        exp = norm(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA   {name}: spark={list(got.columns)} duck={list(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"ROWS     {name}: spark={len(got)} duck={len(exp)}"); fails += 1; continue
    # hash-exact gate: dtype *kind* must match (int-vs-float is the driver's
    # HUGEINT failure class), then values compare exactly — no tolerance.
    kind_mismatch = [(c, got[c].dtype.kind, exp[c].dtype.kind)
                     for c in got.columns if got[c].dtype.kind != exp[c].dtype.kind]
    if kind_mismatch:
        print(f"DTYPE    {name}: {kind_mismatch}"); fails += 1; continue
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        print(f"OK       {name} ({len(got)} rows)")
    except AssertionError as e:
        print(f"VALUES   {name}: {str(e).splitlines()[-1]}")
        fails += 1

# queries without an oracle → rows-only check
declared = set(oracle)
for d in sorted(glob.glob(f"{out}/q*")):
    name = os.path.basename(d)
    if os.path.isdir(d) and name not in declared:
        n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{d}/*.parquet"))
        print(f"{'OK-ROWS ' if n > 0 else 'EMPTY   '} {name} ({n} rows, no oracle)")
        if n == 0: fails += 1

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
