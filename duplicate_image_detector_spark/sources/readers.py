"""Page-source readers: one normalized schema from parquet / JSON / CSV.

S1 analog widened beyond parquet (the reference's single scan source is a
filesystem walk, /root/reference/duplicate-detector.py:556-600; a webtext
corpus arrives as Iceberg/parquet in production but JSON-lines (WARC-WET
derivatives) and CSV exports are common interchange formats).  Every
reader returns the same column set so `run_pipeline` is source-agnostic:

    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Missing columns surface as typed nulls; extra columns are dropped.
Schema inference is never used (a full extra pass over 100 TB that can
mis-type sparse columns): parquet/JSON get the explicit schema; CSV is
read as headered strings — user schemas bind CSV columns by POSITION,
not name, so explicit casts by name happen after the read instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

def _normalize(df: DataFrame) -> DataFrame:
    # try_cast, not cast: under Spark 4 ANSI mode a plain cast THROWS on a
    # malformed cell (e.g. a non-ISO warc_ts string from a CSV export) —
    # the reader's contract is per-row degradation to typed nulls
    cols = []
    for field in PAGES_SCHEMA.fields:
        if field.name in df.columns:
            cols.append(
                F.col(field.name).try_cast(field.dataType).alias(field.name)
            )
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_pages(
    spark: SparkSession, path: str, format: str = "parquet"
) -> DataFrame:
    """Read a pages table in ``format`` ('parquet' | 'json' | 'csv') and
    normalize to PAGES_SCHEMA."""
    if format == "parquet":
        return _normalize(spark.read.parquet(path))
    if format == "json":
        # JSON-lines; explicit schema, no inference pass
        return _normalize(spark.read.schema(PAGES_SCHEMA).json(path))
    if format == "csv":
        # NO user schema here: a user schema binds CSV columns by POSITION
        # (the header is skipped, not matched), so any reordered export
        # would silently load fields crosswise.  Headerless string columns
        # are matched BY NAME, then cast in _normalize; html travels as
        # base64 (CSV cannot carry binary) and decodes via try_to_binary so
        # a malformed cell degrades to null instead of failing the job
        # under ANSI mode.
        raw = spark.read.option("header", "true").csv(path)
        # name matching must be case-insensitive (Spark's own resolver is):
        # an uppercase-header export would otherwise normalize to all nulls
        lowered = [c.lower() for c in raw.columns]
        dupes = sorted({c for c in lowered if lowered.count(c) > 1})
        if dupes:
            # e.g. 'URL' and 'url' in one export: every later F.col would
            # be ambiguous — fail here with the actual colliding names
            # instead of a downstream AnalysisException
            raise ValueError(
                f"duplicate CSV header(s) after case-folding: {dupes} "
                f"(original headers: {raw.columns})"
            )
        raw = raw.toDF(*lowered)
        if "html_b64" in raw.columns:
            raw = raw.withColumn(
                "html", F.try_to_binary(F.col("html_b64"), F.lit("base64"))
            )
        return _normalize(raw)
    raise ValueError(f"unsupported pages format: {format!r}")
