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


def _round_half_up_inplace(a: np.ndarray, scale: float) -> np.ndarray:
    """sign(a) * floor(|a|*scale + 0.5) / scale, IN PLACE.

    Identical values to the expression form (sign-aware HALF_UP, matching
    Spark round() and the DuckDB oracle), but allocates ONE temporary (the
    sign) instead of five — at a 2000x2000 cosine matrix each temporary is
    32 MB, and the allocation traffic measurably dominates the rounding
    stage on memory-bandwidth-limited hosts."""
    s = np.sign(a)
    np.abs(a, out=a)
    np.multiply(a, scale, out=a)
    np.add(a, 0.5, out=a)
    np.floor(a, out=a)
    np.multiply(a, s, out=a)
    np.divide(a, scale, out=a)
    return a


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


_TOPK_SCHEMA = "vec_id bigint, neighbor_id bigint, cos double, rank int"


def _collect_block(df: DataFrame, id_col: str, vec_col: str):
    """Collect (ids, matrix, norms) for one corpus block, id-sorted.
    An empty block (empty input table, or a hash block that received no
    ids) yields empty 2-D shapes — np.linalg.norm(axis=1) would raise on
    the 1-D array np.asarray([]) otherwise."""
    rows = df.select(id_col, vec_col).collect()
    if not rows:
        return (
            np.empty(0, dtype=np.int64),
            np.empty((0, 0), dtype=np.float64),
            np.empty(0, dtype=np.float64),
        )
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    mat = np.asarray([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    order = np.argsort(ids)
    return ids[order], mat[order], norms[order]


def _block_topk_gen(b_ids, b_mat, b_norms, id_col, vec_col, k, scale, ranked):
    """mapInPandas generator: query batches x one broadcast corpus block ->
    per-query top-k rows.  ``ranked=True`` emits final 1..k ranks (single-
    block exact path); ``ranked=False`` emits rank=0 partials for a later
    global window merge."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            if len(pdf) == 0 or len(all_ids) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            qn = np.linalg.norm(q, axis=1)
            cos = (q @ all_mat.T) / (qn[:, None] * all_norms[None, :])
            # HALF_UP away from zero (sign-aware), matching Spark round()
            # and the DuckDB oracle on negative half-tie cosines
            cos = _round_half_up_inplace(cos, scale)
            # exclude self
            self_mask = q_ids[:, None] == all_ids[None, :]
            cos[self_mask] = -np.inf
            # top-k by (cos desc, neighbor_id asc): ids are ascending, and
            # stable argsort on -cos preserves id order within ties
            kk = min(k, cos.shape[1])
            idx = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            n = len(q_ids)
            top_cos = np.take_along_axis(cos, idx, axis=1).ravel()
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(q_ids, kk),
                    "neighbor_id": all_ids[idx].ravel(),
                    "cos": top_cos,
                    "rank": (
                        np.tile(np.arange(1, kk + 1, dtype=np.int32), n)
                        if ranked
                        else np.zeros(n * kk, dtype=np.int32)
                    ),
                }
            )
            # -inf rows are self-matches that leaked in when the block has
            # fewer than k vectors — never real neighbors
            yield out[out["cos"] != -np.inf]

    return gen


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    method: str = "numpy",
    block_rows: int = 262144,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector.

    Output: (vec_id, neighbor_id, cos, rank), rank 1..k by
    (cos desc, neighbor_id asc).  ``cos`` is rounded so results are
    reproducible across engines/summation orders (used for ranking too,
    keeping ties deterministic).

    ``method='numpy'`` (default) is the reference's blocked matmul
    (ref :1404-1415) made distributed-safe: the corpus side is processed in
    ``block_rows``-sized blocks.  When the corpus fits one block, it is
    broadcast whole and each Arrow batch of query vectors does one BLAS
    matmul against it (single driver collect — the reference's own
    operating regime).  Larger corpora never materialize on the driver at
    once: each block is collected/broadcast in turn, per-block top-k
    partials are computed distributed over the query side and materialized,
    the block's executor copies are released, and a final window merge
    takes the global top-k — exact, with driver/executor memory bounded by
    one block (O(block_rows * d)) regardless of corpus size.
    ``method='sql'`` keeps the pure-column-expression variant.
    """
    if method == "sql":
        return _cosine_topk_sql(emb, k, id_col, vec_col, round_digits)

    scale = 10.0 ** round_digits
    sc = emb.sparkSession.sparkContext
    base = emb.select(id_col, vec_col)
    n = base.count()
    # hash blocks are statistical (xxhash64(id) % n_blocks): a block can
    # exceed n/n_blocks, so size to ~0.8*block_rows as a safety factor —
    # the memory bound is then a high-probability bound, not expectation
    n_blocks = max(1, -(-n // max(1, int(block_rows * 0.8))))

    if n_blocks == 1:
        b_ids, b_mat, b_norms = (
            sc.broadcast(x) for x in _collect_block(base, id_col, vec_col)
        )
        gen = _block_topk_gen(
            b_ids, b_mat, b_norms, id_col, vec_col, k, scale, ranked=True
        )
        return base.mapInPandas(gen, schema=_TOPK_SCHEMA)

    from pyspark.storagelevel import StorageLevel

    block_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
    partials: list[DataFrame] = []
    for blk in range(n_blocks):
        ids, mat, norms = _collect_block(
            base.where(block_of == blk), id_col, vec_col
        )
        b_ids, b_mat, b_norms = (sc.broadcast(x) for x in (ids, mat, norms))
        gen = _block_topk_gen(
            b_ids, b_mat, b_norms, id_col, vec_col, k, scale, ranked=False
        )
        part = base.mapInPandas(gen, schema=_TOPK_SCHEMA).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        part.count()  # materialize before releasing the block broadcast
        for bc in (b_ids, b_mat, b_norms):
            bc.unpersist()  # executor copies freed; re-broadcastable on loss
        partials.append(part)

    merged = partials[0]
    for p in partials[1:]:
        merged = merged.union(p)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    out = (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos", "rank")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # materialize the merged top-k, then release the per-block partials —
    # without this the partial caches accumulate for the session lifetime
    out.count()
    for p in partials:
        p.unpersist()
    return out


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


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    block_rows: int = 262144,
) -> DataFrame:
    """EXACT embedding near-dup pairs: (id_a < id_b, cos) for every pair
    with cosine >= threshold — the dedup-decision variant of the
    reference's thresholded all-pairs similarity (ref :1404-1421, the
    ``sscd_sim >= threshold`` test at :1506-1511), distributed the same way
    as ``cosine_topk``: corpus side in broadcast blocks, query side
    streamed through a NumPy matmul, so no driver materialization of the
    full matrix and no quadratic Spark join.  Output is one row per
    unordered pair (emitted only from the query row with the smaller id).
    """
    scale = 10.0 ** round_digits
    sc = emb.sparkSession.sparkContext
    base = emb.select(id_col, vec_col)
    n = base.count()
    # 0.8 safety factor: hash blocks are statistical, see cosine_topk
    n_blocks = max(1, -(-n // max(1, int(block_rows * 0.8))))
    block_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))

    from pyspark.storagelevel import StorageLevel

    def pair_gen(b_ids, b_mat, b_norms):
        def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
            for pdf in batches:
                if len(pdf) == 0 or len(all_ids) == 0:
                    continue
                q_ids = pdf[id_col].to_numpy(dtype=np.int64)
                q = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                qn = np.linalg.norm(q, axis=1)
                cos = (q @ all_mat.T) / (qn[:, None] * all_norms[None, :])
                cos = _round_half_up_inplace(cos, scale)
                hit = (cos >= threshold) & (q_ids[:, None] < all_ids[None, :])
                qi, ci = np.nonzero(hit)
                yield pd.DataFrame(
                    {
                        "id_a": q_ids[qi],
                        "id_b": all_ids[ci],
                        "cos": cos[qi, ci],
                    }
                )

        return gen

    parts: list[DataFrame] = []
    for blk in range(n_blocks):
        src = base if n_blocks == 1 else base.where(block_of == blk)
        ids, mat, norms = _collect_block(src, id_col, vec_col)
        b_ids, b_mat, b_norms = (sc.broadcast(x) for x in (ids, mat, norms))
        part = base.mapInPandas(
            pair_gen(b_ids, b_mat, b_norms),
            schema="id_a bigint, id_b bigint, cos double",
        )
        if n_blocks > 1:
            part = part.persist(StorageLevel.MEMORY_AND_DISK)
            part.count()  # materialize before releasing the block broadcast
            for bc in (b_ids, b_mat, b_norms):
                bc.unpersist()
        parts.append(part)

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    if n_blocks > 1:
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # materialize, then release the per-block partials
        for p in parts:
            p.unpersist()
    return out


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
    max_bucket: int = 1000,
) -> DataFrame:
    """Approximate top-k: candidates from any shared LSH bucket, exact
    cosine re-rank of candidates only.  Same output schema as
    ``cosine_topk``; recall < 1 by design (measured in tests).

    Hot-bucket cap (the text-LSH treatment): bucket sizes come from a
    partial-aggregating groupBy joined back; a bucket larger than
    ``max_bucket`` — correlated embeddings all hashing together — would
    emit O(|bucket|²) candidate pairs, so its *neighbor-candidate side* is
    down-sampled to ~``max_bucket`` members by a deterministic hash of the
    id (content-independent, seed-stable; no window/sort over the hot key).
    Every member still queries against the sampled pool, bounding the
    join output at O(|bucket| * max_bucket); in a hot bucket the members
    are near-interchangeable neighbors, so recall impact is minimal and is
    covered by the recall test.  At 10^9+ vectors also raise ``n_bits``
    (expected bucket size scales with n / 2^n_bits).
    """
    buckets = lsh_buckets(emb, n_tables, n_bits, seed, id_col, vec_col)
    stats = (
        buckets.groupBy("table_id", "bucket")
        .agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") >= 2)
    )
    from pyspark.storagelevel import StorageLevel

    multi = buckets.join(stats, ["table_id", "bucket"]).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    multi.count()  # eager: both self-join sides read the cache (the
    # Python projection pass runs once, not three times)
    left = multi.select("table_id", "bucket", F.col("vec_id"))
    # sample factor ceil(size/cap): keeps ~cap members on the pool side
    keep = F.pmod(
        F.xxhash64(F.col("vec_id"), F.lit(seed)),
        F.ceil(F.col("bucket_size") / F.lit(max_bucket)).cast("long"),
    ) == 0
    right = multi.where(keep).select(
        "table_id", "bucket", F.col("vec_id").alias("neighbor_id")
    )
    cands = (
        left.join(right, ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .dropDuplicates(["vec_id", "neighbor_id"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cands.count()
    multi.unpersist()
    return _rerank_topk(cands, emb, k, id_col, vec_col, round_digits)


def ann_ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 8,
    sample_rows: int = 100000,
    kmeans_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the second ANN
    scale path next to ``ann_lsh_topk``:

      1. seeded spherical k-means on a bounded driver-side SAMPLE
         (``sample_rows`` rows — never the full corpus) yields
         ``n_centroids`` centroids, broadcast everywhere;
      2. every corpus vector is assigned to its nearest centroid
         (NumPy matmul per Arrow batch — one pass, no shuffle);
      3. every query probes its ``n_probe`` nearest centroids; candidates
         are the corpus members of the probed cells (equi-join on
         centroid id);
      4. exact cosine re-rank of candidates (shared verify stage).

    Candidate volume per query ≈ n * n_probe / n_centroids — tune
    n_centroids ~ sqrt(n) and n_probe for the recall/cost point.  The
    centroid-id join is hash-partitioned; cell sizes concentrate around
    n/n_centroids (k-means balances far better than LSH buckets), and AQE's
    skew split handles residual imbalance.  Recall measured in tests.
    """
    rng_sample = emb.select(id_col, vec_col)
    n = rng_sample.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample_df = (
        rng_sample.sample(fraction=frac, seed=seed) if frac < 1.0 else rng_sample
    )
    _ids, mat, _norms = _collect_block(sample_df, id_col, vec_col)
    if len(mat) == 0:
        return emb.sparkSession.createDataFrame([], _TOPK_SCHEMA)
    nc = min(n_centroids, len(mat))
    rng = np.random.default_rng(seed)
    # spherical k-means: cosine assignment == dot on normalized vectors
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    centroids = unit[rng.choice(len(unit), size=nc, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(unit @ centroids.T, axis=1)
        for c in range(nc):
            members = unit[assign == c]
            if len(members):
                v = members.sum(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    sc = emb.sparkSession.sparkContext
    b_cent = sc.broadcast(centroids)

    probe = min(n_probe, nc)

    def assign_gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cent = b_cent.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            q = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-12
            )
            sims = q @ cent.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :probe]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, probe),
                    "centroid": top.ravel().astype(np.int32),
                    "cent_rank": np.tile(
                        np.arange(1, probe + 1, dtype=np.int32), len(ids)
                    ),
                }
            )

    from pyspark.storagelevel import StorageLevel

    base = emb.select(id_col, vec_col)
    # ONE assignment pass: rank-1 row = the vector's home cell, all rows =
    # its probe set (the old two-pass variant ran the full-corpus Python
    # projection twice).  Persist so cells and probes read the same pass.
    assigned = base.mapInPandas(
        assign_gen, schema="vec_id bigint, centroid int, cent_rank int"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    cells = assigned.where(F.col("cent_rank") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "centroid"
    )
    probes = assigned.select("vec_id", "centroid")
    # no dropDuplicates: each corpus vector lives in exactly ONE cell and a
    # query's probed centroids are distinct, so a (query, neighbor) pair
    # can match on at most one centroid — dedup here would be a pure
    # wasted shuffle over the operator's largest intermediate
    cands = (
        probes.join(cells, "centroid")
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cands.count()
    assigned.unpersist()
    return _rerank_topk(cands, emb, k, id_col, vec_col, round_digits)


def _rerank_topk(
    cands: DataFrame,
    emb: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """Exact-cosine re-rank of candidate (vec_id, neighbor_id) pairs to
    per-query top-k — shared by every ANN method (candidates differ, the
    verify stage does not).

    The dot products run as ONE NumPy batch op per Arrow batch
    (``mapInPandas``), not as interpreted ``aggregate(zip_with(...))``
    column expressions: Spark does not codegen higher-order-function
    lambdas, and at n·k candidates × 1024-d vectors the interpreted eval
    (~100 ns/element, measured >50x slower than NumPy in the signature
    stage) would make re-rank the ANN bottleneck.  Rounding matches
    ``_block_topk_gen`` (sign-aware HALF_UP) so every cosine path in this
    module agrees bit-for-bit."""
    scale = 10.0 ** round_digits
    vecs = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    a = vecs.select(F.col("_id").alias("vec_id"), F.col("_v").alias("_va"))
    b = vecs.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_vb"))
    joined = (
        cands.join(a, "vec_id")
        .join(b, "neighbor_id")
        .select("vec_id", "neighbor_id", "_va", "_vb")
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_va"]])
            vb = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_vb"]])
            cos = np.einsum("ij,ij->i", va, vb) / (
                np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            )
            cos = _round_half_up_inplace(cos, scale)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(dtype=np.int64),
                    "cos": cos,
                }
            )

    scored = joined.mapInPandas(
        gen, schema="vec_id bigint, neighbor_id bigint, cos double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos", "rank")
    )
