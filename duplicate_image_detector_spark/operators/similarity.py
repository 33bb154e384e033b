"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

The reference's core primitive is an all-pairs dense-vector similarity join
(/root/reference/duplicate-detector.py:1404-1421, blocked np.dot over
L2-normalized SSCD embeddings).  This module keeps that capability as a
first-class operator over an ``array<float>`` column:

  * ``cosine_topk``   — exact brute-force top-k neighbors; the reference's
    blocked matmul re-expressed as a byte-budgeted block grid (broadcast
    single block, or a cogrouped block x block grid of NumPy kernels).
    Quadratic in compute by nature: the small-scale baseline and the
    test oracle, exactly the role the brute-force path plays in the
    reference — but never a quadratic JOIN (no crossJoin anywhere in the
    module; the old pure-SQL variant that carried one is deleted).
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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duplicate_image_detector_spark.partitioning import ensure_min_parallelism

# split target for the matmul kernels below: the generic 32 MB scan-split
# target leaves small-but-dense inputs single-task, while a too-small one
# fragments the BLAS work into overhead-dominated tasks.  128 KB of packed
# vectors (~16k dims' worth) measured best across the four kernels at
# sf0.1: ann_lsh 1.47 s (generic) / 2.4 s (16 KB) / 1.3 s (128 KB);
# ann_ivf 2.5 / 2.0 / 1.4; cosine_topk flat 0.7-0.8 at both small targets
_DENSE_TARGET_BYTES = 128 << 10

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


_TOPK_SCHEMA = "vec_id bigint, neighbor_id bigint, cos double, rank int"


def _block_grid_size(
    base: DataFrame, vec_col: str, block_rows: int, block_bytes: int
) -> tuple[int, int]:
    """(n rows, n blocks) sized by BOTH a row cap and a byte budget.

    A block is collected/broadcast (single-block path) or held per task
    (grid path) as a float64 matrix of ``rows x dim x 8`` bytes — a row
    cap alone is dimension-blind: 262144 rows of 1024-d vectors is a
    2.1 GB "block".  The byte budget makes high-d corpora leave the
    driver-collect path at ~block_bytes/(d*8) rows (~32k at 1024-d with
    the 256 MB default) instead of at block_rows.  Hash blocks are
    statistical (xxhash64(id) % n_blocks can overfill a block), so the
    target is ~0.8x the cap — a high-probability bound, not expectation.
    """
    stats = base.agg(
        F.count("*").alias("n"), F.max(F.size(vec_col)).alias("d")
    ).first()
    n, dim = stats["n"], stats["d"] or 0
    eff_rows = max(1, min(block_rows, block_bytes // max(1, dim * 8)))
    return n, max(1, -(-n // max(1, int(eff_rows * 0.8))))


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


def _vec_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _topk_indices(cos: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the top-``kk`` values per row by (value desc, column
    asc) — EXACTLY the rows a stable full argsort on ``-cos`` would
    select, without the O(m log m) full-row sort (at a 20k-vector corpus
    block the sort, not the matmul, dominated the kernel).

    Selection: ``argpartition`` finds each row's kk-th largest value;
    rows whose ``>= kth`` candidate set is exactly kk (no boundary ties)
    are gathered vectorized in ascending-column order; rows WITH boundary
    ties (or NaNs) fall back to the stable full argsort, so tie
    resolution is bit-identical to the original in every case.  The final
    stable sort by value over the kk candidates preserves ascending
    column order within ties — the (cos desc, neighbor_id asc) contract
    (column order IS id order; blocks are id-sorted)."""
    n, m = cos.shape
    if kk >= m:
        return np.argsort(-cos, axis=1, kind="stable")[:, :kk]
    kth = -np.partition(-cos, kk - 1, axis=1)[:, kk - 1 : kk]
    with np.errstate(invalid="ignore"):
        mask = cos >= kth
    counts = mask.sum(axis=1)
    sel = np.empty((n, kk), dtype=np.int64)
    good = counts == kk
    if good.any():
        sel[good] = np.nonzero(mask[good])[1].reshape(-1, kk)
    for i in np.nonzero(~good)[0]:
        # already in final (value desc, col asc) order; the shared value
        # re-sort below is stable, so it keeps this order
        sel[i] = np.argsort(-cos[i], kind="stable")[:kk]
    vals = np.take_along_axis(cos, sel, axis=1)
    order = np.argsort(-vals, axis=1, kind="stable")
    return np.take_along_axis(sel, order, axis=1)


def _topk_partial(q_ids, q, c_ids, c_mat, c_norms, k, scale, ranked):
    """One query batch x one corpus block -> per-query top-k rows (pandas).
    The ONE cosine kernel shared by the broadcast single-block path and the
    distributed cogrouped grid — bit-parity between the two paths is by
    construction.  ``ranked=True`` emits final 1..k ranks; ``ranked=False``
    emits rank=0 partials for a later global window merge."""
    import pandas as pd

    qn = np.linalg.norm(q, axis=1)
    cos = (q @ c_mat.T) / (qn[:, None] * c_norms[None, :])
    # HALF_UP away from zero (sign-aware), matching Spark round()
    # and the DuckDB oracle on negative half-tie cosines
    cos = _round_half_up_inplace(cos, scale)
    # exclude self
    self_mask = q_ids[:, None] == c_ids[None, :]
    cos[self_mask] = -np.inf
    # top-k by (cos desc, neighbor_id asc): ids are ascending, and the
    # selection preserves id order within ties (see _topk_indices)
    kk = min(k, cos.shape[1])
    idx = _topk_indices(cos, kk)
    n = len(q_ids)
    top_cos = np.take_along_axis(cos, idx, axis=1).ravel()
    out = pd.DataFrame(
        {
            "vec_id": np.repeat(q_ids, kk),
            "neighbor_id": c_ids[idx].ravel(),
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
    return out[out["cos"] != -np.inf]


def _block_topk_gen(b_ids, b_mat, b_norms, id_col, vec_col, k, scale, ranked):
    """mapInPandas generator: query batches x one broadcast corpus block."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            if len(pdf) == 0 or len(all_ids) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = _vec_matrix(pdf[vec_col])
            yield _topk_partial(
                q_ids, q, all_ids, all_mat, all_norms, k, scale, ranked
            )

    return gen


def _sorted_cell(pdf, id_col, vec_col):
    """(ids, matrix, norms) for one cogroup cell, id-sorted — the executor-
    side analog of ``_collect_block`` (same ascending-id tie order)."""
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    mat = _vec_matrix(pdf[vec_col])[order]
    return ids[order], mat, np.linalg.norm(mat, axis=1)


def _grid_replicate(base: DataFrame, id_col: str, n_q: int, n_c: int):
    """Tag each row with its home block and replicate it across the other
    axis of the (query-block x corpus-block) grid: the query side meets
    every corpus block and vice versa, so each (query, corpus) pair shares
    exactly ONE grid cell.  Replication is a narrow explode over a literal
    block-id array — no join node, no broadcast, no driver loop."""
    qb = F.pmod(F.xxhash64(F.col(id_col), F.lit(7)), F.lit(n_q)).cast("int")
    cb = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_c)).cast("int")
    q_rep = base.select(
        "*",
        qb.alias("qb"),
        F.explode(F.array(*[F.lit(i) for i in range(n_c)])).alias("cb"),
    )
    # the corpus side re-aliases every column: both grid sides derive from
    # the SAME DataFrame, and without fresh attribute ids the cogroup's
    # self-join dedup silently prunes the right side's payload columns
    c_rep = base.select(
        *[F.col(c).alias(c) for c in base.columns],
        F.explode(F.array(*[F.lit(i) for i in range(n_q)])).alias("qb"),
        cb.alias("cb"),
    )
    return q_rep, c_rep


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    block_rows: int = 262144,
    block_bytes: int = 256 << 20,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector.

    Output: (vec_id, neighbor_id, cos, rank), rank 1..k by
    (cos desc, neighbor_id asc).  ``cos`` is rounded so results are
    reproducible across engines/summation orders (used for ranking too,
    keeping ties deterministic).

    The reference's blocked matmul (ref :1404-1415) made
    distributed-safe: the corpus side is processed in blocks sized by
    ``block_rows`` AND ``block_bytes`` (whichever binds — see
    ``_block_grid_size``; a 1024-d corpus leaves the single-block path
    at ~32k rows, not 262k).  When the corpus fits one block, it is
    broadcast whole and each Arrow batch of query vectors does one BLAS
    matmul against it (single driver collect — the reference's own
    operating regime).  Larger corpora never touch the driver at all:
    both sides are hash-tagged into blocks and replicated across a
    (query-block x corpus-block) grid with a narrow explode, a cogrouped
    ``applyInPandas`` runs the same NumPy kernel per grid cell — every
    cell an independent task, no driver collect, no broadcast, no serial
    block loop — and a final window merge takes the global top-k.
    Exact; executor memory bounded by two blocks per task; communication
    is the unavoidable O(n * n_blocks) replication shuffle of any exact
    all-pairs scheme.

    Multi-block outputs are persisted; the caller owns the returned cache
    (``.unpersist()`` when done — same contract as the candidate-pair
    operators).
    """
    scale = 10.0 ** round_digits
    sc = emb.sparkSession.sparkContext
    base = emb.select(id_col, vec_col)
    n, n_blocks = _block_grid_size(base, vec_col, block_rows, block_bytes)

    if n_blocks == 1:
        b_ids, b_mat, b_norms = (
            sc.broadcast(x) for x in _collect_block(base, id_col, vec_col)
        )
        gen = _block_topk_gen(
            b_ids, b_mat, b_norms, id_col, vec_col, k, scale, ranked=True
        )
        # query side of the broadcast path: floor the scan parallelism so
        # the per-batch matmul kernel isn't serialized by a one-row-group
        # input file (no-op on already-parallel inputs).  Dense-kernel
        # split target: the per-row cost is a dim-wide matmul row, far
        # above the generic bytes heuristic's assumption.
        return ensure_min_parallelism(
            base, target_bytes=_DENSE_TARGET_BYTES
        ).mapInPandas(gen, schema=_TOPK_SCHEMA)

    from pyspark.storagelevel import StorageLevel

    q_rep, c_rep = _grid_replicate(base, id_col, n_blocks, n_blocks)

    def cell(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "vec_id": np.empty(0, dtype=np.int64),
                    "neighbor_id": np.empty(0, dtype=np.int64),
                    "cos": np.empty(0, dtype=np.float64),
                    "rank": np.empty(0, dtype=np.int32),
                }
            )
        c_ids, c_mat, c_norms = _sorted_cell(right, id_col, vec_col)
        q_ids = left[id_col].to_numpy(dtype=np.int64)
        q = _vec_matrix(left[vec_col])
        return _topk_partial(
            q_ids, q, c_ids, c_mat, c_norms, k, scale, ranked=False
        )

    partials = (
        q_rep.groupby("qb", "cb")
        .cogroup(c_rep.groupby("qb", "cb"))
        .applyInPandas(cell, schema=_TOPK_SCHEMA)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    out = (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos", "rank")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    return out


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    block_rows: int = 262144,
    block_bytes: int = 256 << 20,
) -> DataFrame:
    """EXACT embedding near-dup pairs: (id_a < id_b, cos) for every pair
    with cosine >= threshold — the dedup-decision variant of the
    reference's thresholded all-pairs similarity (ref :1404-1421, the
    ``sscd_sim >= threshold`` test at :1506-1511), distributed the same way
    as ``cosine_topk``: single-block corpora are broadcast against Arrow
    query batches; larger corpora run the same NumPy kernel per cell of a
    cogrouped (query-block x corpus-block) grid — no driver collect, no
    serial block loop.  Blocks are sized by ``block_rows`` AND
    ``block_bytes`` (see ``_block_grid_size``).  Output is one row per
    unordered pair (each pair shares exactly one grid cell and is
    emitted from the side with the smaller id), so no merge or dedup
    stage is needed after the kernel.
    """
    scale = 10.0 ** round_digits
    sc = emb.sparkSession.sparkContext
    base = emb.select(id_col, vec_col)
    n, n_blocks = _block_grid_size(base, vec_col, block_rows, block_bytes)

    def _pairs_of(q_ids, q, c_ids, c_mat, c_norms):
        import pandas as pd

        qn = np.linalg.norm(q, axis=1)
        cos = (q @ c_mat.T) / (qn[:, None] * c_norms[None, :])
        cos = _round_half_up_inplace(cos, scale)
        hit = (cos >= threshold) & (q_ids[:, None] < c_ids[None, :])
        qi, ci = np.nonzero(hit)
        return pd.DataFrame(
            {"id_a": q_ids[qi], "id_b": c_ids[ci], "cos": cos[qi, ci]}
        )

    pair_schema = "id_a bigint, id_b bigint, cos double"

    if n_blocks == 1:
        b_ids, b_mat, b_norms = (
            sc.broadcast(x) for x in _collect_block(base, id_col, vec_col)
        )

        def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            all_ids, all_mat, all_norms = (
                b_ids.value, b_mat.value, b_norms.value,
            )
            for pdf in batches:
                if len(pdf) == 0 or len(all_ids) == 0:
                    continue
                q_ids = pdf[id_col].to_numpy(dtype=np.int64)
                yield _pairs_of(
                    q_ids, _vec_matrix(pdf[vec_col]), all_ids, all_mat, all_norms
                )

        return ensure_min_parallelism(
            base, target_bytes=_DENSE_TARGET_BYTES
        ).mapInPandas(gen, schema=pair_schema)

    q_rep, c_rep = _grid_replicate(base, id_col, n_blocks, n_blocks)

    def cell(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "id_a": np.empty(0, dtype=np.int64),
                    "id_b": np.empty(0, dtype=np.int64),
                    "cos": np.empty(0, dtype=np.float64),
                }
            )
        c_ids, c_mat, c_norms = _sorted_cell(right, id_col, vec_col)
        q_ids = left[id_col].to_numpy(dtype=np.int64)
        return _pairs_of(q_ids, _vec_matrix(left[vec_col]), c_ids, c_mat, c_norms)

    return (
        q_rep.groupby("qb", "cb")
        .cogroup(c_rep.groupby("qb", "cb"))
        .applyInPandas(cell, schema=pair_schema)
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

    return ensure_min_parallelism(
        emb.select(id_col, vec_col), target_bytes=_DENSE_TARGET_BYTES
    ).mapInPandas(gen, schema=out_schema)


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

    The returned DataFrame is persisted and the caller owns that cache
    (``.unpersist()`` when done); internal candidate caches are released
    before returning.
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
    # candidates stay LAZY: re-rank consumes them exactly once, so a
    # persist+count here would be a pure extra pass — the bucket cache
    # (multi) stays resident until the output materializes and is the
    # only thing the candidate join re-reads
    cands = (
        left.join(right, ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    # materialize the re-ranked top-k, then drop the bucket cache — the
    # CALLER owns the returned cache (.unpersist() when done); nothing
    # internal is left persisted
    out = _rerank_topk(cands, emb, k, id_col, vec_col, round_digits).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out.count()
    multi.unpersist()
    return out


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

    The returned DataFrame is persisted and the caller owns that cache
    (``.unpersist()`` when done); internal assignment/candidate caches are
    released before returning.
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
    # scale the cell count with the corpus (the docstring's own guidance,
    # n_centroids ~ sqrt(n)): candidate volume per query is
    # n * n_probe / n_centroids, so a FIXED 64 cells makes re-rank work
    # grow quadratically with n — at 20k vectors the 64-cell default put
    # 50M candidate rows through the re-rank kernel.  sqrt(n) keeps
    # per-query candidates ~ sqrt(n) * n_probe.  The floor is the passed
    # n_centroids, so corpora up to n_centroids² rows (4096 at the
    # default 64) behave BIT-IDENTICALLY to the fixed-cell version — the
    # driver-checked recall gates at sf<=0.1 are unchanged.
    nc = min(max(n_centroids, min(1024, int(n ** 0.5))), len(mat))
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
    assigned = ensure_min_parallelism(
        base, target_bytes=_DENSE_TARGET_BYTES
    ).mapInPandas(
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
    # wasted shuffle over the operator's largest intermediate.  Candidates
    # stay LAZY (re-rank consumes them exactly once); the assignment cache
    # holds until the output materializes.
    cands = (
        probes.join(cells, "centroid")
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
    )
    # caller owns the returned cache; the assignment cache is dropped here
    out = _rerank_topk(cands, emb, k, id_col, vec_col, round_digits).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out.count()
    assigned.unpersist()
    return out


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
