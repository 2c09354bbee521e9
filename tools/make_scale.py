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
- documents.text goes through a PER-REPLICA KEYED SUBSTITUTION CIPHER
  (md5-keyed Fisher-Yates permutation of letters->letters and
  digits->digits, case preserved; lengths, punctuation, whitespace
  untouched): the map is injective and class-preserving, so WITHIN a
  replica the duplicate / near-duplicate structure (which shingles are
  equal, hence every jaccard) is EXACTLY preserved, while ACROSS
  replicas a shingle collides only if a fixed random substitution maps
  one corpus shingle onto another — ~0 — so dedup group counts,
  candidate pairs, and LSH bucket sizes scale linearly with corpus size
  instead of quadratically (10 exact copies of every doc would explode
  every bucket, benchmarking the data not the algorithm). Earlier
  rounds used Caesar(letters+digits) x reversal, which supports only 52
  distinct replicas; the keyed substitution has no replica cap (sf10 =
  100 replicas) with the same two invariants.
- embeddings get per-replica deterministic SIGN FLIPS (a reflection):
  within a replica every pairwise cosine is exactly preserved, across
  replicas vectors decorrelate — ANN/SemDeDup cluster sizes scale
  linearly. (A constant dim-0 offset — the first attempt — made all
  replicas near-PARALLEL and collapsed every LSH bucket/IVF cell.)
  Signs are md5-keyed per (replica, dim): the earlier parity(dim AND
  replica) pattern is determined by the replica index's low 6 bits at
  dim 64, so replica 64 would repeat replica 0's reflection EXACTLY —
  bit-identical vectors, every cross-replica pair a spurious duplicate.
- Timestamps are left unchanged: windows get replicas-times the rows per
  window, which is the per-window density growth a real 10x ingest has.
"""
import sys
import hashlib
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000_000

def _keyed_shuffle(alphabet: str, salt: str, i: int):
    """Deterministic Fisher-Yates keyed by md5(salt, replica, step) —
    no RNG state, any process regenerates the identical permutation."""
    arr = list(alphabet)
    for j in range(len(arr) - 1, 0, -1):
        h = int(hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest(), 16)
        k = h % (j + 1)
        arr[j], arr[k] = arr[k], arr[j]
    return arr

def text_table(i: int):
    """Per-replica substitution table: letters->letters (case
    preserved), digits->digits, everything else fixed. Injective and
    class-preserving, so shingle equality WITHIN a replica is exactly
    that of the source corpus (every jaccard preserved); ACROSS
    replicas r and s the relative map is one fixed random substitution,
    and a corpus shingle lands on another corpus shingle under it with
    ~0 probability. (Replaces Caesar x reversal, which aliased beyond
    52 replicas.) Replica 0 is the identity: the source rows survive
    verbatim so sfN strictly contains the structures of the source sf.
    """
    if i == 0:
        return None
    lower = _keyed_shuffle("abcdefghijklmnopqrstuvwxyz", "L", i)
    digits = _keyed_shuffle("0123456789", "D", i)
    m = {}
    for a, b in zip("abcdefghijklmnopqrstuvwxyz", lower):
        m[a] = b
        m[a.upper()] = b.upper()
    for a, b in zip("0123456789", digits):
        m[a] = b
    return str.maketrans(m)

def shift_text(s: str, table) -> str:
    if table is None or s is None:
        return s
    return s.translate(table)

def sign_row(i: int, dim: int):
    """Per-(replica, dim) md5-keyed signs. parity(d AND i) — the first
    scheme — is a function of i's low log2(dim) bits only: at dim 64,
    replica 64 repeats replica 0's reflection exactly and every
    cross-replica pair becomes a spurious exact duplicate. md5 keys
    never alias. Replica 0 stays the identity.
    """
    if i == 0:
        return None
    return [1 if int(hashlib.md5(f"E:{i}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1 for d in range(dim)]

def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
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
                    tab = text_table(i)
                    cols[name] = pa.array(
                        [shift_text(v.as_py(), tab) for v in col.combine_chunks()],
                        type=base.schema.field(name).type)
                elif t == "embeddings" and name == "embedding" and i > 0:
                    # per-replica deterministic sign flips (a reflection):
                    # within a replica every angle/cosine is EXACTLY
                    # preserved, across replicas vectors decorrelate.
                    # (First attempt was a +50*i offset on dim 0: that made
                    # replicas 1..9 near-parallel to e0, collapsed every
                    # LSH bucket / IVF cell, and blew q34/q36 to 162M
                    # output rows — measured, replaced. Second attempt
                    # used parity(d AND i) signs, which alias at i >= 64
                    # — see sign_row.)
                    vals = col.combine_chunks().to_pylist()
                    signs = None
                    for v in vals:
                        if v:
                            if signs is None:
                                signs = sign_row(i, len(v))
                            for d in range(len(v)):
                                if signs[d] < 0:
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
