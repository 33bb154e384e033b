"""Iceberg capability layer: probe semantics, config shape, and the loud
failure when table_format='iceberg' is requested without the runtime jar.
The real write path runs only where the jar exists (skipif, like the PIL
codec tests) — this container ships none, so the gate itself is the test."""

from __future__ import annotations

import pytest

from duplicate_image_detector_spark.sources import iceberg
from duplicate_image_detector_spark.sources.checkpoints import CheckpointManager


def test_conf_shape():
    conf = iceberg.iceberg_conf("/warehouse/x", catalog="c1")
    assert conf["spark.sql.catalog.c1"].endswith("SparkCatalog")
    assert conf["spark.sql.catalog.c1.type"] == "hadoop"
    assert conf["spark.sql.catalog.c1.warehouse"] == "/warehouse/x"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_probe_is_false_without_jar(spark):
    assert iceberg.has_iceberg(spark) is False


def test_checkpoint_manager_gates_loudly(spark, cfg):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")


def test_unknown_format_rejected(spark, cfg):
    with pytest.raises(ValueError, match="table_format"):
        CheckpointManager(spark, "x", cfg, table_format="orc")


def test_disabled_manager_skips_probe(spark, cfg):
    # a disabled (in-memory) manager never touches the catalog, so it must
    # construct even where the jar is absent
    m = CheckpointManager(
        spark, "", cfg, enabled=False, table_format="iceberg"
    )
    assert m.computed_stages == []


@pytest.mark.skipif(
    True, reason="Iceberg runtime jar not available in this container"
)
def test_stage_roundtrip_on_real_catalog(spark, cfg):  # pragma: no cover
    df = spark.range(5).toDF("doc_id")
    m = CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")
    out = m.run("docs", lambda: df)
    assert out.count() == 5
    assert m.is_complete("docs")
    again = CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")
    assert again.run("docs", lambda: 1 / 0).count() == 5  # resumed, not run
