#!/usr/bin/env python3
"""Derive a larger scale factor from driver testdata by key-shifted
replication — the scale-rehearsal input (VERDICT r4 #2).

Usage: python3 tools/make_scale.py <srcDir> <dstDir> <replicas>

Design notes (what makes the copy honest for scaling measurements):
- Key domains (custkey/orderkey/suppkey/partkey/event_id/user_id/doc_id/
  vec_id) shift by replica*STRIDE, consistently across tables, so every
  join keeps its selectivity and per-key cardinality.
- nation/region stay fixed (TPC-H scaling keeps dims constant), so
  broadcast-dim joins stay broadcast-dim joins.
- documents.text is Caesar-shifted per replica (letters AND digits;
  lengths, punctuation, whitespace preserved): WITHIN a replica the
  duplicate / near-duplicate structure is bit-identical to the source,
  ACROSS replicas shingle overlap is ~0 — so dedup group counts,
  candidate pairs, and LSH bucket sizes scale linearly with corpus size
  instead of quadratically (10 exact copies of every doc would explode
  every bucket, benchmarking the data not the algorithm).
- embeddings get per-replica deterministic SIGN FLIPS (a reflection):
  within a replica every pairwise cosine is exactly preserved, across
  replicas vectors decorrelate — ANN/SemDeDup cluster sizes scale
  linearly. (A constant dim-0 offset — the first attempt — made all
  replicas near-PARALLEL and collapsed every LSH bucket/IVF cell.)
- Timestamps are left unchanged: windows get replicas-times the rows per
  window, which is the per-window density growth a real 10x ingest has.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000_000

def shift_text(s: str, k: int) -> str:
    if k == 0 or s is None:
        return s
    out = []
    for ch in s:
        o = ord(ch)
        if 97 <= o <= 122:
            out.append(chr(97 + (o - 97 + k) % 26))
        elif 65 <= o <= 90:
            out.append(chr(65 + (o - 65 + k) % 26))
        elif 48 <= o <= 57:
            # digits rotate too: numeric tokens would otherwise alias
            # across replicas and blow near-dup pair counts superlinearly
            out.append(chr(48 + (o - 48 + k) % 10))
        else:
            out.append(ch)
    # The Caesar shift repeats mod 26, and the corpus is letter-only
    # tokens — replicas i and i+26 would be BIT-IDENTICAL (measured:
    # 100% of 5-token shingles are digit-free), silently doubling every
    # cross-replica dedup structure at sf5. The second 26-block reverses
    # the string: shingle windows of a reversed doc map bijectively onto
    # reversed shingles of the original, so WITHIN a replica every
    # pairwise jaccard is exactly preserved, while across blocks shingle
    # strings share ~nothing. Supports up to 52 distinct replicas.
    if (k // 26) % 2 == 1:
        out.reverse()
    return "".join(out)

def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    assert n <= 52, "text decorrelation (Caesar x reversal) supports <= 52 replicas"
    import os
    os.makedirs(dst, exist_ok=True)
    import shutil
    for t in ("region", "nation"):
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied (fixed dim)")

    key_shifts = {
        "customer":  ["c_custkey"],
        "supplier":  ["s_suppkey"],
        "part":      ["p_partkey"],
        "orders":    ["o_orderkey", "o_custkey"],
        "lineitem":  ["l_orderkey", "l_partkey", "l_suppkey"],
        "events":    ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t, keys in key_shifts.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        reps = []
        for i in range(n):
            cols = {}
            for name in base.schema.names:
                col = base.column(name)
                if name in keys:
                    typ = base.schema.field(name).type
                    import pyarrow.compute as pc
                    cols[name] = pc.cast(
                        pc.add(pc.cast(col, pa.int64()), i * STRIDE), typ)
                elif t == "documents" and name == "text" and i > 0:
                    cols[name] = pa.array(
                        [shift_text(v.as_py(), i) for v in col.combine_chunks()],
                        type=base.schema.field(name).type)
                elif t == "embeddings" and name == "embedding" and i > 0:
                    # per-replica deterministic sign flips (a reflection):
                    # within a replica every angle/cosine is EXACTLY
                    # preserved, across replicas vectors decorrelate.
                    # (First attempt was a +50*i offset on dim 0: that made
                    # replicas 1..9 near-parallel to e0, collapsed every
                    # LSH bucket / IVF cell, and blew q34/q36 to 162M
                    # output rows — measured, replaced.)
                    vals = col.combine_chunks().to_pylist()
                    for v in vals:
                        if v:
                            for d in range(len(v)):
                                if bin(d & i).count("1") % 2 == 1:
                                    v[d] = -v[d]
                    cols[name] = pa.array(vals, type=base.schema.field(name).type)
                else:
                    cols[name] = col.combine_chunks()
            reps.append(pa.table(cols, schema=base.schema))
        out = pa.concat_tables(reps)
        # split-friendly layout: Spark parallelizes a parquet scan at
        # row-group granularity, so one giant row group would serialize
        # every downstream pipeline onto one task no matter the cluster
        # size (measured: the sf1 rehearsal ran documents pipelines on a
        # single core before this). ~64 groups per table = 2 waves on
        # local[32]; real ingests get this for free from many files.
        rg = max(1000, out.num_rows // 64)
        pq.write_table(out, f"{dst}/{t}.parquet", row_group_size=rg)
        print(f"{t}: {base.num_rows} -> {out.num_rows}")

if __name__ == "__main__":
    main()
