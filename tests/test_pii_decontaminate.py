"""PII scrubbing and benchmark decontamination: exact fixtures,
idempotence, near-miss non-matches, plan audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.pii import scrub_pii
from duplicate_image_detector_spark.operators.decontaminate import (
    contamination_flags,
)


def test_scrub_pii_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b@x.co or +4917012345678 from 192.168.0.1 end"),
            (2, "price +12 only, a@b none, 1.2.3 not a quad"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert got[1]["text"] == (
        "mail |||EMAIL||| or |||PHONE||| from |||IP||| end"
    )
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 1, 1)
    # near-misses: short +number, no TLD, 3-part dotted number
    assert got[2]["text"] == "price +12 only, a@b none, 1.2.3 not a quad"
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 0, 0)
    # corrupt row tolerated
    assert (got[3]["text"], got[3]["n_email"]) == ("", 0)


def test_scrub_pii_idempotent(spark):
    docs = spark.createDataFrame(
        [(1, "x a.b@x.co y 10.0.0.1 z +1234567890")],
        "doc_id long, text string",
    )
    once = scrub_pii(docs)
    twice = scrub_pii(once.select("doc_id", "text"))
    r1 = once.collect()[0]
    r2 = twice.collect()[0]
    assert r1["text"] == r2["text"]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0)


SENT = "the quick brown fox jumps over the lazy dog tonight"  # 10 words


def test_contamination_flags(spark):
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {SENT} trailing text"),
            (2, "completely unrelated content about spark partitions"),
            (3, SENT),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, SENT)], "bench_id long, text string"
    )
    out = contamination_flags(docs, bench, k=8, min_shared=1)
    got = {(r["doc_id"], r["bench_id"]): r["n_shared_grams"] for r in out.collect()}
    # 10-word sentence -> 3 distinct 8-grams, all shared by docs 1 and 3
    assert got == {(1, 100): 3, (3, 100): 3}
    # min_shared filters
    assert contamination_flags(docs, bench, k=8, min_shared=4).count() == 0


def test_contamination_plan_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [(1, SENT)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, SENT)], "bench_id long, text string"
    )
    plan = (
        contamination_flags(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
