"""Mirror of the driver's correctness gate: every queries() entry is run on
Spark and compared against its oracle_sql() DuckDB result — row count,
column names, and exact values after column-name sort (the driver's
order-insensitive value-hash, reproduced as a sorted-frame equality).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
Set SPARK_GRAFT_ORACLE_SF_DIR to test another scale.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()
# gates retired from the driver registry (50-row report budget) stay
# value-checked here with the same machinery
ORACLES.update(entrymod.retired_oracle_sql())
QUERIES.update(entrymod.retired_queries())


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(_duck(ORACLES[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        # dtype class must agree: the driver's value-hash stringifies, so an
        # int column vs a float column ("99111" vs "99111.0") hash-mismatches
        # even when values are numerically equal (round-1 lesson)
        assert (g.dtype.kind in "iu") == (w.dtype.kind in "iu"), (
            f"{name}.{col}: dtype class {g.dtype} vs {w.dtype}"
        )
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert (g.isna() == w.isna()).all(), f"{name}.{col}: NaN mismatch"
            diffs = (g.astype(float).fillna(0.0) - w.astype(float).fillna(0.0)).abs()
            assert float(diffs.max() or 0.0) == 0.0, (
                f"{name}.{col}: max diff {diffs.max()}"
            )
        else:
            same = (g.astype(str).values == w.astype(str).values)
            assert same.all(), (
                f"{name}.{col}: first mismatch at {(~same).argmax()}: "
                f"{g[(~same)].head(3).tolist()} != {w[(~same)].head(3).tolist()}"
            )


def test_all_queries_have_oracle_or_reason():
    # every gate is value-checked — the ANN gates emit a one-row recall
    # summary precisely so no query is left on the weaker rows-only check
    assert set(QUERIES) - set(ORACLES) == set()


def test_registry_within_driver_budget():
    # the driver reports at most 50 gates; a 51st registry entry is
    # silently dropped from CORRECTNESS_r{N}.json (observed in round 5:
    # windowed_event_counts, the last entry, went unreported)
    assert len(entrymod.queries()) <= 50
    assert "windowed_event_counts" in entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"doc_id", "cluster_id"}
