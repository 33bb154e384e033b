"""Similarity search: brute-force sanity + ANN recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from duplicate_image_detector_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    # 40 clusters of 5 nearby vectors -> meaningful neighbors
    rows = []
    vid = 0
    for c in range(40):
        center = rng.standard_normal(32)
        for _ in range(5):
            v = center + 0.05 * rng.standard_normal(32)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.persist()
    df.count()
    return df


def test_cosine_topk_finds_cluster_neighbors(emb_df):
    res = cosine_topk(emb_df, k=4).toPandas()
    # each vector's 4 nearest should be its 4 cluster-mates
    labels = {
        r["vec_id"]: r["label"] for r in emb_df.select("vec_id", "label").collect()
    }
    correct = sum(
        1 for _, r in res.iterrows()
        if labels[r["vec_id"]] == labels[r["neighbor_id"]]
    )
    assert correct / len(res) > 0.95


def test_cosine_topk_shape(emb_df):
    res = cosine_topk(emb_df, k=4).toPandas()
    assert set(res.columns) == {"vec_id", "neighbor_id", "cos", "rank"}
    counts = res.groupby("vec_id")["rank"].agg(["count", "max"])
    assert (counts["count"] == 4).all()
    assert (counts["max"] == 4).all()
    assert (res["cos"] <= 1.0000001).all()


def test_ann_recall_vs_brute_force(emb_df):
    brute = cosine_topk(emb_df, k=4).toPandas()
    ann = ann_lsh_topk(emb_df, k=4, n_tables=8, n_bits=8).toPandas()
    want = set(zip(brute["vec_id"], brute["neighbor_id"]))
    got = set(zip(ann["vec_id"], ann["neighbor_id"]))
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall


def test_ann_deterministic(emb_df):
    a = ann_lsh_topk(emb_df, k=3).toPandas().sort_values(
        ["vec_id", "rank"], ignore_index=True
    )
    b = ann_lsh_topk(emb_df, k=3).toPandas().sort_values(
        ["vec_id", "rank"], ignore_index=True
    )
    assert a.equals(b)


def test_cosine_topk_blocked_matches_single_block(emb_df):
    """block_rows smaller than the corpus -> multi-block distributed path;
    output must be identical to the single-broadcast exact path."""
    single = cosine_topk(emb_df, k=4).toPandas().sort_values(
        ["vec_id", "rank"], ignore_index=True
    )
    blocked = cosine_topk(emb_df, k=4, block_rows=37).toPandas().sort_values(
        ["vec_id", "rank"], ignore_index=True
    )
    assert single.equals(blocked)


def test_cosine_grid_plan_has_no_quadratic_joins(emb_df):
    """The multi-block grid replicates via a narrow explode, never a
    join — the executed plan must contain no cartesian or
    broadcast-nested-loop node (the audit the other operators carry)."""
    out = cosine_topk(emb_df, k=3, block_rows=37)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    out.unpersist()


def test_cosine_topk_small_corpus_fewer_than_k(spark):
    """corpus smaller than k+1: every vector gets n-1 neighbors, no
    self-matches, no crash (the -inf guard)."""
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = cosine_topk(df, k=5).toPandas()
    assert len(res) == 3 * 2
    assert (res["vec_id"] != res["neighbor_id"]).all()


def test_ann_hot_bucket_capped(spark):
    """1000 near-identical vectors all but guarantee one hot LSH bucket:
    with max_bucket=50 the candidate join output stays ~linear (bounded by
    n * cap * tables, far below the quadratic ~8M pairs) and neighbors are
    still found."""
    rng = np.random.default_rng(11)
    center = rng.standard_normal(16)
    rows = [
        (i, [float(x) for x in center + 1e-4 * rng.standard_normal(16)])
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.persist()
    df.count()
    res = ann_lsh_topk(df, k=3, n_tables=2, n_bits=4, max_bucket=50)
    pdf = res.toPandas()
    df.unpersist()
    # every vector still gets k neighbors from the sampled pool
    assert pdf.groupby("vec_id").size().min() == 3
    assert (pdf["cos"] > 0.99).all()


def test_cosine_dup_pairs_exact_and_blocked(emb_df, spark):
    from duplicate_image_detector_spark.operators.similarity import (
        cosine_dup_pairs,
    )

    single = cosine_dup_pairs(emb_df, threshold=0.9).toPandas().sort_values(
        ["id_a", "id_b"], ignore_index=True
    )
    blocked = cosine_dup_pairs(
        emb_df, threshold=0.9, block_rows=37
    ).toPandas().sort_values(["id_a", "id_b"], ignore_index=True)
    assert single.equals(blocked)
    # cluster-mates (0.05 noise around a shared center) are near-dups:
    # every pair is canonical and above threshold
    assert len(single) > 0
    assert (single["id_a"] < single["id_b"]).all()
    assert (single["cos"] >= 0.9).all()


def test_ann_ivf_recall_vs_brute_force(emb_df):
    from duplicate_image_detector_spark.operators.similarity import (
        ann_ivf_topk,
    )

    brute = cosine_topk(emb_df, k=4).toPandas()
    ivf = ann_ivf_topk(
        emb_df, k=4, n_centroids=40, n_probe=6, kmeans_iters=8
    ).toPandas()
    want = set(zip(brute["vec_id"], brute["neighbor_id"]))
    got = set(zip(ivf["vec_id"], ivf["neighbor_id"]))
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall


def test_ann_ivf_deterministic(emb_df):
    from duplicate_image_detector_spark.operators.similarity import (
        ann_ivf_topk,
    )

    a = ann_ivf_topk(emb_df, k=3).toPandas().sort_values(
        ["vec_id", "rank"], ignore_index=True
    )
    b = ann_ivf_topk(emb_df, k=3).toPandas().sort_values(
        ["vec_id", "rank"], ignore_index=True
    )
    assert a.equals(b)


def test_byte_budget_forces_grid_on_high_d(spark):
    """A high-dimensional corpus must leave the driver-collect path well
    below ``block_rows`` rows: with 256-d vectors and a 64 KiB budget the
    byte cap binds (64KiB/(256*8) = 32 rows/block), the grid path runs,
    and output is bit-identical to the single-block path."""
    from duplicate_image_detector_spark.operators.similarity import (
        _block_grid_size,
        cosine_dup_pairs,
    )

    rng = np.random.default_rng(5)
    rows = []
    for c in range(20):
        center = rng.standard_normal(256)
        for j in range(6):
            v = center + 0.03 * rng.standard_normal(256)
            rows.append((c * 6 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.persist()
    df.count()

    n, blocks = _block_grid_size(
        df, "embedding", block_rows=262144, block_bytes=64 << 10
    )
    assert n == 120 and blocks > 1  # byte cap binds, row cap never would

    single = cosine_topk(df, k=3).toPandas().sort_values(
        ["vec_id", "rank"], ignore_index=True
    )
    grid = cosine_topk(
        df, k=3, block_bytes=64 << 10
    ).toPandas().sort_values(["vec_id", "rank"], ignore_index=True)
    assert single.equals(grid)

    p_single = cosine_dup_pairs(df, threshold=0.9).toPandas().sort_values(
        ["id_a", "id_b"], ignore_index=True
    )
    p_grid = cosine_dup_pairs(
        df, threshold=0.9, block_bytes=64 << 10
    ).toPandas().sort_values(["id_a", "id_b"], ignore_index=True)
    df.unpersist()
    assert len(p_single) > 0 and p_single.equals(p_grid)


def test_topk_indices_matches_stable_argsort():
    """_topk_indices must select and order EXACTLY the rows the stable
    full argsort picks, including boundary ties, -inf self-masks, and
    duplicated (rounded) values."""
    import numpy as np

    from duplicate_image_detector_spark.operators.similarity import (
        _topk_indices,
    )

    rng = np.random.default_rng(11)
    for trial in range(50):
        n, m = rng.integers(1, 40), rng.integers(1, 60)
        kk = int(rng.integers(1, m + 1))
        # coarse rounding plants plenty of exact ties; sprinkle -inf
        cos = np.round(rng.standard_normal((n, m)), 1)
        cos[rng.random((n, m)) < 0.1] = -np.inf
        want = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        got = _topk_indices(cos, kk)
        assert np.array_equal(got, want), (trial, n, m, kk)
