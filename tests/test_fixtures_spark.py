"""The distributed corpus generator (bench/scaling/recall input): truth
columns must ride along row-aligned, family ids must be partition-unique,
and the corpus must be seed-deterministic across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_image_detector_spark.sources.fixtures import (
    generate_pages,
    generate_pages_spark,
)


def test_truth_columns_row_aligned(spark):
    df = generate_pages_spark(
        spark, 200, seed=7, n_partitions=4, include_truth=True
    ).toPandas()
    # every url embeds its planted family name — the truth column must agree
    fam_from_url = df["url"].str.extract(r"https://[^/]+/([a-z]+)/")[0]
    assert (fam_from_url == df["family"]).all()


def test_family_ids_partition_unique(spark):
    df = generate_pages_spark(
        spark, 400, seed=7, n_partitions=4, include_truth=True
    )
    # a family never spans urls with different partition prefixes
    spans = (
        df.select(
            "family_id",
            F.regexp_extract("url", r"https://(p\d+)\.", 1).alias("part"),
        )
        .groupBy("family_id")
        .agg(F.countDistinct("part").alias("nparts"))
        .where(F.col("nparts") > 1)
        .count()
    )
    assert spans == 0


def test_partition_slice_matches_local_generator(spark):
    """Partition 0's slice is exactly generate_pages(per_part, seed') with
    the p0 host prefix — distributed generation adds nothing nondeterministic."""
    n_part = 4
    df = generate_pages_spark(
        spark, 200, seed=7, n_partitions=n_part, include_truth=True
    ).where(F.col("url").startswith("https://p0.")).toPandas()
    want, truth = generate_pages(200 // n_part, seed=7 * 100003 + 0)
    assert len(df) == len(want)
    got = df.sort_values("url", ignore_index=True)
    want = want.copy()
    want["url"] = want["url"].str.replace(
        "https://", "https://p0.", n=1, regex=False
    )
    want = want.sort_values("url", ignore_index=True)
    assert (got["text"].values == want["text"].values).all()
    assert (got["url"].values == want["url"].values).all()
