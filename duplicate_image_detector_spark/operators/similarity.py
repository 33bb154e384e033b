"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

The reference's core primitive is an all-pairs dense-vector similarity join
(/root/reference/duplicate-detector.py:1404-1421, blocked np.dot over
L2-normalized SSCD embeddings).  This module keeps that capability as a
first-class operator over an ``array<float>`` column:

  * ``cosine_topk``   — exact brute-force top-k neighbors; the reference's
    blocked matmul re-expressed as a crossJoin + JVM ``zip_with``/
    ``aggregate`` dot product.  Quadratic: the small-scale baseline and the
    test oracle, exactly the role the brute-force path plays in the
    reference.
  * ``ann_lsh_topk``  — the scale path: signed-random-projection LSH
    (Charikar'02) computed in a NumPy-vectorized ``mapInPandas`` (Arrow
    batches), bucket equi-join to form candidates, exact cosine re-rank of
    candidates only.  Sub-quadratic; recall measured against brute force in
    tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    method: str = "numpy",
) -> DataFrame:
    """Exact top-k cosine neighbors per vector.

    Output: (vec_id, neighbor_id, cos, rank), rank 1..k by
    (cos desc, neighbor_id asc).  ``cos`` is rounded so results are
    reproducible across engines/summation orders (used for ranking too,
    keeping ties deterministic).

    ``method='numpy'`` (default) is the reference's blocked matmul
    (ref :1404-1415) verbatim in spirit: the full matrix is broadcast to
    executors and each Arrow batch of query vectors does one BLAS matmul
    against it — distributed over the query side, O(n·d) memory per
    executor.  Fits while the corpus side fits an executor (the reference's
    own operating regime); beyond that, ``ann_lsh_topk`` is the scale path.
    ``method='sql'`` keeps the pure-column-expression variant.
    """
    if method == "sql":
        return _cosine_topk_sql(emb, k, id_col, vec_col, round_digits)

    import pandas as pd  # noqa: F401

    rows = emb.select(id_col, vec_col).collect()
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    mat = np.asarray([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    order = np.argsort(ids)
    ids, mat, norms = ids[order], mat[order], norms[order]
    sc = emb.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)
    b_norms = sc.broadcast(norms)
    scale = 10.0 ** round_digits

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            qn = np.linalg.norm(q, axis=1)
            cos = (q @ all_mat.T) / (qn[:, None] * all_norms[None, :])
            cos = np.floor(cos * scale + 0.5) / scale  # round half-up
            # exclude self
            self_mask = q_ids[:, None] == all_ids[None, :]
            cos[self_mask] = -np.inf
            # top-k by (cos desc, neighbor_id asc): ids are ascending, and
            # stable argsort on -cos preserves id order within ties
            idx = np.argsort(-cos, axis=1, kind="stable")[:, :k]
            n = len(q_ids)
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(q_ids, k),
                    "neighbor_id": all_ids[idx].ravel(),
                    "cos": np.take_along_axis(cos, idx, axis=1).ravel(),
                    "rank": np.tile(np.arange(1, k + 1, dtype=np.int32), n),
                }
            )
            yield out

    return emb.select(id_col, vec_col).mapInPandas(
        gen, schema="vec_id bigint, neighbor_id bigint, cos double, rank int"
    )


def _cosine_topk_sql(
    emb: DataFrame, k: int, id_col: str, vec_col: str, round_digits: int
) -> DataFrame:
    a = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    ).withColumn("_na", _norm(F.col("_va")))
    b = a.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("_va").alias("_vb"),
        F.col("_na").alias("_nb"),
    )
    pairs = a.crossJoin(b).where(F.col("vec_id") != F.col("neighbor_id"))
    cos = F.round(
        _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
        round_digits,
    )
    scored = pairs.select("vec_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos", "rank")
    )


def lsh_buckets(
    emb: DataFrame,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table_id, bucket) via signed random projections.

    The projection matmul runs NumPy-vectorized per Arrow batch — the
    analog of the reference's batched model forward (ref :1024-1098).
    Plane matrix is regenerated per executor from the seed (tiny,
    deterministic) rather than broadcast.
    """
    out_schema = "vec_id bigint, table_id int, bucket bigint"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        planes: np.ndarray | None = None
        powers = (1 << np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((n_tables, n_bits, vecs.shape[1]))
            ids = pdf[id_col].to_numpy()
            frames = []
            for t in range(n_tables):
                proj = vecs @ planes[t].T  # (n, n_bits)
                bits = (proj > 0).astype(np.int64)
                bucket = bits @ powers
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "table_id": np.full(len(ids), t, dtype=np.int32),
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return emb.select(id_col, vec_col).mapInPandas(gen, schema=out_schema)


def ann_lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates from any shared LSH bucket, exact
    cosine re-rank of candidates only.  Same output schema as
    ``cosine_topk``; recall < 1 by design (measured in tests)."""
    buckets = lsh_buckets(emb, n_tables, n_bits, seed, id_col, vec_col)
    left = buckets.select("table_id", "bucket", F.col("vec_id").alias("vec_id"))
    right = buckets.select(
        "table_id", "bucket", F.col("vec_id").alias("neighbor_id")
    )
    cands = (
        left.join(right, ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    vecs = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_n", _norm(F.col("_v")))
    a = vecs.select(
        F.col("_id").alias("vec_id"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = vecs.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    scored = (
        cands.join(a, "vec_id")
        .join(b, "neighbor_id")
        .select(
            "vec_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                round_digits,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos", "rank")
    )
