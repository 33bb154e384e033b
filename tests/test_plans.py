"""Physical-plan audits: the properties the 100-TB design depends on,
asserted on the actual executed plans (not just documented).

- filter pushdown + column pruning reach the parquet scan,
- whole-stage codegen covers the JVM column-expression gates,
- no CartesianProduct / BroadcastNestedLoopJoin anywhere in any
  SQL-expressible gate's plan.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    df = E.q_lang_id(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(text)]" in plan
    # column pruning: the scan must not read the unused columns
    assert "lang" not in plan.split("ReadSchema")[1][:200]
    assert "source" not in plan.split("ReadSchema")[1][:200]


def test_codegen_covers_column_gates(spark):
    # "*(n)" is the whole-stage-codegen marker in executedPlan strings.
    # token_stats is deliberately absent: it is built on higher-order
    # functions (transform/aggregate), which Spark interprets — the
    # engine's Python hot path avoids HOFs for exactly that reason
    # (operators/signatures.py docstring).
    assert "*(" in _plan(E.q_binary_meta(spark, SF_DIR))
    # AQE gates must be EXECUTED (collect on the same query execution)
    # before the final plan — with its codegen spans — exists
    for q in (E.q_exact_canon_clusters, E.q_tpch_q1):
        df = q(spark, SF_DIR)
        df.collect()
        p = _plan(df)
        assert "isFinalPlan=true" in p and "*(" in p, q.__name__


# queries whose plan construction is cheap enough to audit here; the
# heavyweight dedup gates have dedicated no-cartesian asserts in
# tests/test_ngram_simhash.py
_CHEAP = [
    "exact_canon_clusters",
    "doc_fingerprint",
    "lang_id",
    "token_stats",
    "quality_score",
    "binary_meta",
    "doc_validity_stats",
    "doc_preview",
    "tpch_q1",
    "top_orders_per_cust",
    "customers_without_orders",
    "parts_with_lineitems",
    "events_minutely",
    "event_sessions",
    "events_props_agg",
    "orders_monthly",
    "events_pivot",
    "orders_rollup",
]


@pytest.mark.parametrize("name", _CHEAP)
def test_no_quadratic_join_nodes(spark, name):
    plan = _plan(E.queries()[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
