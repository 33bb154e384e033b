"""Iceberg capability layer — probe, catalog config, and the table-write
path the checkpoint/store layers use when an Iceberg catalog is present.

The SURVEY data model names Iceberg tables ("checkpoint per-stage to
Iceberg"); this sandbox ships no Iceberg runtime jar, so the engine follows
the same pattern as the media codecs (functions/multimodal.py): probe at
runtime, use the real thing when present, fall back loudly otherwise.
Everything here is plain public Spark + Iceberg API:

  - ``iceberg_conf()`` returns the standard SparkCatalog configuration for
    a Hadoop-warehouse catalog (the zero-service deployment; swap
    ``type=hadoop`` for ``type=rest``/``hive`` in a real deployment).
  - ``has_iceberg(spark)`` probes the JVM for the Iceberg Spark catalog
    class — the definitive "is the runtime jar on the classpath" test.
  - ``write_table`` / ``read_table`` / ``table_exists`` are the three
    operations CheckpointManager needs; each Iceberg write is a single
    atomic snapshot commit, which is exactly what the parquet fallback's
    ``_STAGE_COMPLETE`` marker approximates.

Production wiring:

    from duplicate_image_detector_spark.session import get_spark
    from duplicate_image_detector_spark.sources.iceberg import iceberg_conf
    spark = get_spark(extra_conf=iceberg_conf("/warehouse"))
    ckpt = CheckpointManager(spark, "ckpt_db", cfg, table_format="iceberg")

(spark-submit additionally needs
``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: catalog name the engine uses for its stage/store tables
CATALOG = "dedup"

_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_conf(warehouse: str, catalog: str = CATALOG) -> dict[str, str]:
    """Spark confs for a Hadoop-warehouse Iceberg catalog (public API;
    see iceberg.apache.org/docs 'Spark Configuration')."""
    return {
        f"spark.sql.catalog.{catalog}": _CATALOG_CLASS,
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def has_iceberg(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime jar is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_CATALOG_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def catalog_provider(spark: SparkSession, catalog: str = CATALOG) -> str | None:
    """``'iceberg'`` when the configured ``catalog`` is the Iceberg
    SparkCatalog; ``None`` for any OTHER configured V2 catalog — the
    write path then goes through that catalog's default table provider.
    The None arm is what lets the identical write/read/exists/resume code
    execute against a jar-free test-double catalog (tests use Spark's
    built-in JDBCTableCatalog over embedded Derby); snapshot-commit
    atomicity is then whatever that catalog provides."""
    cls = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return "iceberg" if cls == _CATALOG_CLASS else None


def require_iceberg(spark: SparkSession, catalog: str = CATALOG) -> None:
    """Fail loudly and EARLY — at construction time, not after the first
    stage has already been computed.  Accepts either the real Iceberg
    catalog (jar must be on the classpath) or any other configured V2
    catalog under the same name (test-double mode, see
    ``catalog_provider``)."""
    cls = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if cls is None:
        raise RuntimeError(
            "table_format='iceberg' requires a configured "
            f"'{catalog}' catalog — build the session with "
            "get_spark(extra_conf=iceberg_conf(<warehouse>)) and the "
            "Iceberg Spark runtime jar "
            "(--packages org.apache.iceberg:iceberg-spark-runtime-...). "
            "This environment has neither — use the parquet checkpoint "
            "format (the default)."
        )
    if cls == _CATALOG_CLASS and not has_iceberg(spark):
        raise RuntimeError(
            f"catalog '{catalog}' is configured as Iceberg but the runtime "
            "jar is not on the classpath "
            "(--packages org.apache.iceberg:iceberg-spark-runtime-...)."
        )


def valid_namespace(namespace: str) -> bool:
    """True iff the string is a plain identifier Iceberg accepts unquoted.

    CheckpointManager reuses its ``base_dir`` as the namespace; a caller
    passing a filesystem PATH ('/tmp/ckpt') by habit must fail at
    construction with a clear message, not with a mid-run ParseException.
    """
    import re

    return re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", namespace) is not None


def _qualify(namespace: str, table: str, catalog: str = CATALOG) -> str:
    # identifiers are backtick-quoted defensively; namespace legality is
    # enforced up front by valid_namespace
    return f"{catalog}.`{namespace}`.`{table}`"


def write_table(
    df: DataFrame, namespace: str, table: str, catalog: str = CATALOG
) -> None:
    """Replace-or-create the stage table in ONE atomic snapshot commit.

    The ``USING iceberg`` clause is attached only when the catalog IS
    Iceberg (``catalog_provider``); a test-double V2 catalog writes with
    its own default provider — same code path, same commit semantics
    surface."""
    spark = df.sparkSession
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.`{namespace}`")
    wt = df.writeTo(_qualify(namespace, table, catalog))
    provider = catalog_provider(spark, catalog)
    if provider:
        wt = wt.using(provider)
    wt.createOrReplace()


def append_table(
    df: DataFrame, namespace: str, table: str, catalog: str = CATALOG
) -> None:
    """Append rows, creating the table on first write (audit-log shape)."""
    spark = df.sparkSession
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.`{namespace}`")
    full = _qualify(namespace, table, catalog)
    if spark.catalog.tableExists(full):
        df.writeTo(full).append()
    else:
        wt = df.writeTo(full)
        provider = catalog_provider(spark, catalog)
        if provider:
            wt = wt.using(provider)
        wt.create()


def drop_table(
    spark: SparkSession, namespace: str, table: str, catalog: str = CATALOG
) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {_qualify(namespace, table, catalog)}")


def read_table(
    spark: SparkSession, namespace: str, table: str, catalog: str = CATALOG
) -> DataFrame:
    return spark.read.table(_qualify(namespace, table, catalog))


def table_exists(
    spark: SparkSession, namespace: str, table: str, catalog: str = CATALOG
) -> bool:
    return spark.catalog.tableExists(_qualify(namespace, table, catalog))
