"""Connected components vs the DSU oracle on hand-built and random graphs."""

from __future__ import annotations

import random

import pytest

from duplicate_image_detector_spark.operators.components import (
    connected_components,
    py_dsu_components,
)

GRAPHS = {
    "chain": [(i, i + 1) for i in range(1, 20)],
    "star": [(1, i) for i in range(2, 15)],
    "two_components": [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)],
    "self_loop": [(5, 5), (5, 6)],
    "duplicate_edges": [(1, 2), (2, 1), (1, 2)],
    "single_edge": [(7, 9)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_matches_dsu(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    expected_raw = py_dsu_components([(a, b) for a, b in edges if a != b])
    # DSU maps each node to component min already (union by min)
    expected = {n: r for n, r in expected_raw.items()}
    assert got == expected


def test_cc_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(1000))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(600)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    expected = py_dsu_components(edges)
    assert got == expected
