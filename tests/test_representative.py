"""Cluster assembly: A4 mean score, A5 representative, A6 best pair."""

from __future__ import annotations

from duplicate_image_detector_spark.operators.representative import (
    assemble_clusters,
)


def test_best_pair_per_member_and_rep(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    edges = spark.createDataFrame(
        [
            (1, 2, 0.90, "near"),
            (2, 3, 0.95, "near"),
            (1, 3, 0.95, "substring"),
        ],
        "id_a long, id_b long, score double, tier string",
    )
    rows = {r["doc_id"]: r for r in assemble_clusters(comps, edges).collect()}
    # best incident edge per member (ties -> smaller partner id)
    assert (rows[1]["best_match_id"], rows[1]["best_score"]) == (3, 0.95)
    assert (rows[2]["best_match_id"], rows[2]["best_score"]) == (3, 0.95)
    assert (rows[3]["best_match_id"], rows[3]["best_score"]) == (1, 0.95)
    # mean member scores (A4)
    assert abs(rows[1]["score"] - 0.925) < 1e-12
    assert abs(rows[3]["score"] - 0.95) < 1e-12
    # representative = arg-max mean score (A5)
    assert [d for d, r in rows.items() if r["is_representative"]] == [3]
    # tier = highest-priority incident tier
    assert rows[1]["tier"] == "near" and rows[3]["tier"] == "near"
