"""Iceberg capability layer: probe semantics, config shape, the loud
failure when table_format='iceberg' is requested with no catalog, and —
via a jar-free test-double V2 catalog (Spark's built-in JDBCTableCatalog
over embedded Derby, shipped in every Spark distribution) — an EXECUTED
run of the full catalog-checkpoint code path: write_table / append_table /
read_table / table_exists / drop_table, CheckpointManager stage roundtrip,
resume-skip, invalidation, and stage metrics.  Only the literal
``USING iceberg`` clause and the ``_file`` lineage column are
Iceberg-catalog-specific (``catalog_provider`` branches); those arms still
need a real jar (the skipif test at the bottom)."""

from __future__ import annotations

import os
import tempfile

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


@pytest.fixture()
def v2_catalog(spark):
    """Configure the engine's catalog name as a jar-free V2 test double
    (JDBCTableCatalog over embedded Derby).  Derby cannot store ARRAY
    columns, so array-bearing stages (signatures) need real Iceberg — the
    scalar checkpoint flow below is exactly the manager's code path."""
    db = tempfile.mkdtemp(prefix="derby_cat_")
    os.rmdir(db)
    name = iceberg.CATALOG
    spark.conf.set(
        f"spark.sql.catalog.{name}",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    spark.conf.set(f"spark.sql.catalog.{name}.url", f"jdbc:derby:{db};create=true")
    spark.conf.set(
        f"spark.sql.catalog.{name}.driver", "org.apache.derby.jdbc.EmbeddedDriver"
    )
    yield name
    for k in ("", ".url", ".driver"):
        spark.conf.unset(f"spark.sql.catalog.{name}{k}")


def test_catalog_provider_branch(spark, v2_catalog):
    # the test double is NOT iceberg -> no USING clause is attached
    assert iceberg.catalog_provider(spark) is None
    spark.conf.set(
        "spark.sql.catalog.provtest", "org.apache.iceberg.spark.SparkCatalog"
    )
    assert iceberg.catalog_provider(spark, "provtest") == "iceberg"
    spark.conf.unset("spark.sql.catalog.provtest")


def test_table_ops_roundtrip_on_v2_catalog(spark, v2_catalog):
    df = spark.range(5).toDF("x")
    assert not iceberg.table_exists(spark, "ns_ops", "t1")
    iceberg.write_table(df, "ns_ops", "t1")
    assert iceberg.table_exists(spark, "ns_ops", "t1")
    assert iceberg.read_table(spark, "ns_ops", "t1").count() == 5
    iceberg.write_table(spark.range(3).toDF("x"), "ns_ops", "t1")  # replace
    assert iceberg.read_table(spark, "ns_ops", "t1").count() == 3
    iceberg.append_table(spark.range(2).toDF("x"), "ns_ops", "t1")
    assert iceberg.read_table(spark, "ns_ops", "t1").count() == 5
    iceberg.append_table(spark.range(4).toDF("x"), "ns_ops", "t2")  # create arm
    assert iceberg.read_table(spark, "ns_ops", "t2").count() == 4
    iceberg.drop_table(spark, "ns_ops", "t2")
    assert not iceberg.table_exists(spark, "ns_ops", "t2")


def test_checkpoint_roundtrip_and_resume_on_v2_catalog(spark, cfg, v2_catalog):
    df = spark.range(7).toDF("doc_id")
    m = CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")
    out = m.run("docs", lambda: df)
    assert out.count() == 7
    assert m.is_complete("docs")
    assert m.computed_stages == ["docs"]
    # second manager resumes: the stage fn must never run (1/0 would raise)
    again = CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")
    assert again.run("docs", lambda: 1 / 0).count() == 7
    assert again.resumed_stages == ["docs"]
    # stage metrics were appended and read back through the catalog
    met = m.stage_metrics()
    assert met is not None
    rows = {r["stage"]: r for r in met.collect()}
    assert rows["docs"]["rows_out"] == 7
    # invalidation forces a recompute through the replace path
    again.invalidate("docs")
    assert not again.is_complete("docs")
    m3 = CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")
    assert m3.run("docs", lambda: spark.range(4).toDF("doc_id")).count() == 4


def test_checkpoint_key_isolation_on_v2_catalog(spark, cfg, v2_catalog):
    # a flipped run-level flag must key to a DIFFERENT table, not resume
    m1 = CheckpointManager(
        spark, "ckpt_db", cfg, table_format="iceberg", extra_key="a"
    )
    m1.run("docs", lambda: spark.range(2).toDF("doc_id"))
    m2 = CheckpointManager(
        spark, "ckpt_db", cfg, table_format="iceberg", extra_key="b"
    )
    assert not m2.is_complete("docs")
    assert m2.run("docs", lambda: spark.range(9).toDF("doc_id")).count() == 9


@pytest.mark.skipif(
    True,
    reason=(
        "needs org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 "
        "(the Spark 4.x Iceberg runtime; no maven access and no jar ships "
        "in this container — verified by filesystem search).  To run: "
        "start the session with spark.jars.packages=<that coordinate> and "
        "spark.sql.catalog.dedup=org.apache.iceberg.spark.SparkCatalog "
        "(type=hadoop, warehouse=<dir>).  The catalog LOGIC already "
        "executes jar-free against Spark's JDBCTableCatalog-over-Derby V2 "
        "double in the tests above; only real snapshot commits and "
        "concurrent-writer behavior remain jar-bound."
    ),
)
def test_stage_roundtrip_on_real_catalog(spark, cfg):  # pragma: no cover
    df = spark.range(5).toDF("doc_id")
    m = CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")
    out = m.run("docs", lambda: df)
    assert out.count() == 5
    assert m.is_complete("docs")
    again = CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")
    assert again.run("docs", lambda: 1 / 0).count() == 5  # resumed, not run
