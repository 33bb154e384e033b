"""Incremental signature ingest via Structured Streaming (availableNow)."""

from __future__ import annotations

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.streaming.incremental import (
    incremental_signatures,
)


def test_incremental_signatures_matches_batch(spark, tiny_pages_df, cfg, tmp_path):
    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "sigs")
    chk_dir = str(tmp_path / "chk")
    tiny_pages_df.select("url", "warc_ts", "html", "text", "lang").write.parquet(in_dir)

    q = incremental_signatures(spark, in_dir, out_dir, chk_dir, cfg)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    from duplicate_image_detector_spark.operators.signatures import compute_signatures
    from pyspark.sql import functions as F

    # must match incremental_signatures' defaults (pipeline sig options:
    # slim rows, poly hash) — the no-drift contract under test
    batch = compute_signatures(
        tiny_pages_df.select(F.xxhash64("url").alias("doc_id"), "text"),
        cfg,
        include_shingles=False,
        hash_kind="poly",
    )
    g = {r["doc_id"]: (r["simhash"], tuple(r["minhash"])) for r in got.collect()}
    w = {r["doc_id"]: (r["simhash"], tuple(r["minhash"])) for r in batch.collect()}
    # streaming path applies no min-length filter beyond non-null text;
    # compare on the common universe computed by both
    assert g == w

    # second trigger with no new files appends nothing (exactly-once)
    q2 = incremental_signatures(spark, in_dir, out_dir, chk_dir, cfg)
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == len(g)
