#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [oracleJsonName]
Reads <outDir>/oracle_sql.json + each <outDir>/<name>/ parquet written by
graft.Verify, replays the SQL in DuckDB over the same sf parquet tables,
and compares (schema by sorted column names, values by sorted rows).
A SPARK_GRAFT_ONLY subset run of Verify writes oracle_sql.subset.json
instead (so a reused outDir's full-run manifest is never clobbered);
pass that name as the third arg to gate just the subset.
"""
import sys, json, glob, math, struct
import duckdb
import numpy as np
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
# The sf5 ANN/cluster oracles (codebook x corpus argmin replays)
# materialize >125 GB unbounded; a limit + temp dir lets DuckDB spill
# instead of getting OOM-killed. GRAFT_CHECK_MEMLIMIT overrides.
import os
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_CHECK_MEMLIMIT', '80GB')}'")
con.execute("SET temp_directory='/tmp/duck_spill'")
for t in TABLES:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle_name = sys.argv[3] if len(sys.argv) > 3 else "oracle_sql.json"
oracle = json.load(open(f"{outdir}/{oracle_name}"))

# GRAFT_CHECK_SKIP: comma-separated query names to skip — used by the
# sf1 scale rehearsal, where a few oracles are brute-force-quadratic by
# design (q31/q54 replay all-pairs jaccard + a recursive CTE in DuckDB)
# and cannot finish at 50k docs. The SPARK side still runs them (bench);
# only the DuckDB replay is skipped, and skips are reported loudly.
import os
skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
for name in sorted(skip & set(oracle)):
    print(f"SKIP  {name} (GRAFT_CHECK_SKIP)")
oracle = {k: v for k, v in oracle.items() if k not in skip}

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
    # Strict, driver-grade cell identity: the driver hashes values after a
    # dtype-sensitive serialization, so int64(3) != float64(3.0) and
    # -0.0 != +0.0. cell_key reproduces that: floats compare by their IEEE
    # bit pattern, ints/floats carry distinct type tags.
    def cell_key(x):
        try:
            if bool(pd.isna(x)):
                return ("na",)
        except (TypeError, ValueError):
            pass
        if isinstance(x, (bool, np.bool_)):
            return ("b", bool(x))
        if isinstance(x, (float, np.floating)):
            return ("f", struct.pack("<d", float(x)).hex())
        if isinstance(x, (int, np.integer)):
            return ("i", int(x))
        if isinstance(x, (list, tuple, np.ndarray)):
            return ("l", tuple(cell_key(v) for v in x))
        return ("o", str(x))
    diffs = []
    for c in got.columns:
        a, b = got[c].tolist(), exp[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if cell_key(x) != cell_key(y):
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
