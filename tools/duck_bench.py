#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB for BENCH_BASELINE.md.

Usage: python3 tools/duck_bench.py <sfDir> <verifyOutDir> [out.json]
Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
the sf parquet tables as views, and times each query in DuckDB with
SET threads TO 32: one warm-up run, then best of 2 steady-state runs,
90 s timeout per query (enforced per-query via a worker process so the
brute-force-by-design oracles, q31/q54, can't stall the sweep).
Emits JSON {name: seconds | "timeout"}.
"""
import sys, json, time, multiprocessing as mp

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
TIMEOUT_S = 90.0


def run_query(sfdir, sql, q):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    con.execute(sql).fetchall()  # warm-up
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchall()
        best = min(best, time.time() - t0)
    q.put(best)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        p = mp.Process(target=run_query, args=(sfdir, sql, q))
        t0 = time.time()
        p.start()
        p.join(TIMEOUT_S * 2 + 30)  # warm-up + 2 timed runs
        if p.is_alive() or q.empty():
            if p.is_alive():
                p.terminate()
                p.join()
            results[name] = "timeout"
            print(f"{name}\ttimeout>{int(TIMEOUT_S)}s", flush=True)
        else:
            best = q.get()
            results[name] = round(best, 3)
            print(f"{name}\t{best:.3f}", flush=True)
    if out_path:
        json.dump(results, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
