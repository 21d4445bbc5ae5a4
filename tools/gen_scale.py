#!/usr/bin/env python3
"""Dev tool: derive an sf1-scale dataset from the driver's read-only sf0.1
parquet by replicating the FACT tables 10x (dims stay fixed — exactly the
100-TB regime: facts grow, dimension tables stay broadcastable).

Per-copy transforms keep every engine invariant intact while avoiding
fake cross-copy structure:
  - lineitem/orders: shift l_orderkey/o_orderkey by copy*(max+1) — keeps the
    annotation-id arithmetic encoding injective (Tables.annotationsView
    multiplies orderkey, so only orderkey may grow) and referential
    integrity with the unshifted dims.
  - events: shift event_id and user_id (sessions stay per-copy; per-user
    event density constant, 10x users). The ns-timestamp column is copied
    byte-identical via pyarrow (duckdb would rewrite it as us and break
    Tables.events' nanosAsLong read path).
  - documents: shift doc_id; for copy i>0 every whitespace token gets an
    _i suffix, so shingle sets are DISJOINT across copies — near-dup
    structure per copy is identical to sf0.1 instead of every doc gaining
    9 artificial twins (which would grow candidate pairs 45x, a data
    artifact, not an engine property). n_chars recomputed.
  - embeddings: shift vec_id; copy i>0 gets a copy-seeded signed
    permutation of the vector dims — an orthogonal transform, so
    within-copy cosines are bit-preserved and cross-copy cosines are
    decorrelated.

Usage: gen_scale.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 /root/repo/scaledata/sf1 10
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scaledata/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

DIMS = ["customer", "supplier", "part", "nation", "region"]


def shift_col(table, name, off, i):
    idx = table.schema.get_field_index(name)
    col = table.column(name)
    shifted = pa.chunked_array(
        [pa.array(c.to_numpy(zero_copy_only=False) + off * i, type=col.type)
         for c in col.chunks])
    return table.set_column(idx, table.schema.field(idx), shifted)


def replicate(name, shifts, transform=None):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    offs = {c: int(pa.compute.max(src.column(c)).as_py()) + 1 for c in shifts}
    parts = []
    for i in range(COPIES):
        t = src
        for c in shifts:
            t = shift_col(t, c, offs[c], i)
        if transform is not None:
            t = transform(t, i)
        parts.append(t)
    out = pa.concat_tables(parts)
    # Row-group layout: a real 100-TB corpus arrives in thousands of file
    # splits; pyarrow's default (~1M rows/group) wrote the whole derived
    # documents/embeddings table into ONE row group, so whole-corpus
    # signature compute landed in one unsplittable scan task and read as a
    # fake straggler in the skew gate. Target ≥ 64 groups per table (and
    # ≤ 64k rows/group) so local[32] always has splits to parallelize over.
    rows_per_group = max(1024, min(65536, out.num_rows // 64))
    pq.write_table(out, f"{DST}/{name}.parquet", row_group_size=rows_per_group)
    print(f"{name}: {src.num_rows} -> {out.num_rows} "
          f"({rows_per_group} rows/group)")


def doc_transform(t, i):
    if i == 0:
        return t
    suffix = f"_{i}"
    texts = [None if v is None else
             " ".join(w + suffix for w in v.split(" "))
             for v in t.column("text").to_pylist()]
    arr = pa.array(texts, type=pa.string())
    t = t.set_column(t.schema.get_field_index("text"),
                     t.schema.field("text"), arr)
    n = pa.array([None if v is None else len(v) for v in texts],
                 type=t.column("n_chars").type)
    return t.set_column(t.schema.get_field_index("n_chars"),
                        t.schema.field("n_chars"), n)


def emb_transform(t, i):
    if i == 0:
        return t
    vecs = t.column("embedding").to_pylist()
    dim = len(next(v for v in vecs if v is not None))
    rng = np.random.RandomState(1000 + i)
    perm = rng.permutation(dim)
    signs = rng.choice([-1.0, 1.0], dim).astype(np.float32)
    out = [None if v is None else
           (signs * np.asarray(v, dtype=np.float32)[perm]).tolist()
           for v in vecs]
    arr = pa.array(out, type=t.column("embedding").type)
    return t.set_column(t.schema.get_field_index("embedding"),
                        t.schema.field("embedding"), arr)


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    for d in DIMS:
        src = pq.read_table(f"{SRC}/{d}.parquet")
        pq.write_table(src, f"{DST}/{d}.parquet")
        print(f"{d}: {src.num_rows} (dim, unscaled)")
    replicate("orders", ["o_orderkey"])
    replicate("lineitem", ["l_orderkey"])
    replicate("events", ["event_id", "user_id"])
    replicate("documents", ["doc_id"], doc_transform)
    replicate("embeddings", ["vec_id"], emb_transform)


if __name__ == "__main__":
    main()
