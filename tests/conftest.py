from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.session import get_spark
from duplicate_image_detector_spark.sources.fixtures import generate_pages


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dedup-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "1m"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return PipelineConfig()


@pytest.fixture(scope="session")
def tiny_corpus():
    """(pages pandas, truth pandas) — ~200 docs, seed 42."""
    return generate_pages(n_docs=200, seed=42)


@pytest.fixture(scope="session")
def tiny_pages_df(spark, tiny_corpus):
    pages, _ = tiny_corpus
    df = spark.createDataFrame(pages)
    df.persist()
    df.count()
    return df
