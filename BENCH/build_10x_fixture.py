"""Rebuild the 10x synthetic scale fixture (/tmp/sf1x10) from sf0.1.

Run with PYTHONHASHSEED=1710 (the word-sort salt uses hash()) to get the
exact fixture used by BENCH/bench_r7_scale10x_cont.json.  Measurement
tooling only — not part of the engine, never run by bench.py.

Construction mirrors BENCH/bench_r7_scale10x_ab.json's description:
replicate every table 10x with key shifts (referential integrity
preserved: fact FKs shift together with their dimension PKs); document
copies k>=1 get a per-copy deterministic word sort so cross-copy shingle
overlap vanishes while within-copy near-dup families survive.  Fully
deterministic — no RNG, no timestamps.
"""
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1x10"
K = 10
SHIFT = 10_000_000  # key shift per copy; far above any base key

shutil.rmtree(DST, ignore_errors=True)
os.makedirs(DST)


def copies(tbl, shifts):
    out = []
    for k in range(K):
        t = tbl
        for col in shifts:
            arr = pc.add(t.column(col), pa.scalar(k * SHIFT, pa.int64()))
            t = t.set_column(t.schema.get_field_index(col), col, arr)
        out.append(t)
    return pa.concat_tables(out)


def sort_words(text, k):
    # per-copy deterministic word sort: stable order keyed by a per-copy
    # salt of the word, destroying cross-copy shingle overlap while docs
    # within a copy (same transform) keep their near-dup relations
    ws = text.split()
    return " ".join(sorted(ws, key=lambda w: hash(f"{k}|{w}")))


# documents: id shift + per-copy word sort (copy 0 untouched)
docs = pq.read_table(f"{SRC}/documents.parquet")
doc_tables = []
for k in range(K):
    ids = pc.add(docs.column("doc_id"), pa.scalar(k * SHIFT, pa.int64()))
    if k == 0:
        texts = docs.column("text")
    else:
        texts = pa.array(
            [None if t is None else sort_words(t, k)
             for t in docs.column("text").to_pylist()],
            type=pa.string(),
        )
    t = docs.set_column(docs.schema.get_field_index("doc_id"), "doc_id", ids)
    t = t.set_column(t.schema.get_field_index("text"), "text", texts)
    doc_tables.append(t)
pq.write_table(pa.concat_tables(doc_tables), f"{DST}/documents.parquet")

# embeddings: id shift + per-copy deterministic rotation of the vector
# (a cyclic shift of components) so cross-copy exact-duplicate vectors
# don't explode the dup-pair gates while within-copy structure survives
emb = pq.read_table(f"{SRC}/embeddings.parquet")
emb_tables = []
vecs = emb.column("embedding").to_pylist()
for k in range(K):
    ids = pc.add(emb.column("vec_id"), pa.scalar(k * SHIFT, pa.int64()))
    if k == 0:
        v = emb.column("embedding")
    else:
        v = pa.array([None if x is None else x[k:] + x[:k] for x in vecs],
                     type=emb.schema.field("embedding").type)
    t = emb.set_column(emb.schema.get_field_index("vec_id"), "vec_id", ids)
    t = t.set_column(t.schema.get_field_index("embedding"), "embedding", v)
    emb_tables.append(t)
pq.write_table(pa.concat_tables(emb_tables), f"{DST}/embeddings.parquet")

# events: ids shift (user_id too, keeping per-user session structure)
pq.write_table(
    copies(pq.read_table(f"{SRC}/events.parquet"), ["event_id", "user_id"]),
    f"{DST}/events.parquet",
)
# TPC-H-ish: shift PK/FK pairs together
pq.write_table(
    copies(pq.read_table(f"{SRC}/customer.parquet"), ["c_custkey"]),
    f"{DST}/customer.parquet",
)
pq.write_table(
    copies(pq.read_table(f"{SRC}/orders.parquet"), ["o_orderkey", "o_custkey"]),
    f"{DST}/orders.parquet",
)
pq.write_table(
    copies(
        pq.read_table(f"{SRC}/lineitem.parquet"),
        ["l_orderkey", "l_partkey", "l_suppkey"],
    ),
    f"{DST}/lineitem.parquet",
)
pq.write_table(
    copies(pq.read_table(f"{SRC}/part.parquet"), ["p_partkey"]),
    f"{DST}/part.parquet",
)
pq.write_table(
    copies(pq.read_table(f"{SRC}/supplier.parquet"), ["s_suppkey"]),
    f"{DST}/supplier.parquet",
)
# dimensions referenced by un-shifted small keys: single copy
for t in ("nation", "region"):
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
open(f"{DST}/_DONE", "w").write("")
for f in sorted(os.listdir(DST)):
    if f.endswith(".parquet"):
        print(f, pq.ParquetFile(f"{DST}/{f}").metadata.num_rows)
