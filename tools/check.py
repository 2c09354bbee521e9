#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads <outDir>/oracle_sql.json + each <outDir>/<name>/ parquet written by
graft.Verify, replays the SQL in DuckDB over the same sf parquet tables,
and compares (schema by sorted column names, values by sorted rows).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        exp = norm(con.execute(sql).df())
    except Exception as e:
        fails.append((name, f"error: {e}")); continue
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"schema: spark={list(got.columns)} duck={list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows: spark={len(got)} duck={len(exp)}")); continue
    diffs = []
    for c in got.columns:
        a, b = got[c].tolist(), exp[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            try:
                both_na = bool(pd.isna(x)) and bool(pd.isna(y))
            except (TypeError, ValueError):
                both_na = False
            same = both_na or (x == y) or (x is None and y is None)
            if not same and isinstance(x, float) and isinstance(y, float):
                same = (math.isnan(x) and math.isnan(y)) or x == y
            if not same:
                diffs.append((c, i, x, y))
                if len(diffs) > 3: break
        if len(diffs) > 3: break
    if diffs:
        fails.append((name, f"values: {diffs[:4]}"))
    else:
        print(f"  OK  {name} ({len(got)} rows)")

for name, why in fails:
    print(f"FAIL  {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracled queries match")
sys.exit(1 if fails else 0)
