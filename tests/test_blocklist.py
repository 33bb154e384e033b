"""Domain-blocklist filter: suffix semantics, python oracle, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.urls import (
    host_col,
    host_suffixes,
)
from duplicate_image_detector_spark.operators.blocklist import (
    blocked_doc_ids,
    filter_blocked_hosts,
)

DOCS = [
    # (doc_id, url)
    (1, "http://example.com/a"),
    (2, "https://WWW.Example.COM:443/b"),      # canon -> example.com
    (3, "http://sub.example.com/c"),           # subdomain of a blocked entry
    (4, "http://deep.ads.tracker.net/x"),      # deeper than the entry
    (5, "http://tracker.net/clean"),           # parent of an entry: NOT blocked
    (6, "http://examples.com/near-miss"),      # suffix is label-wise, not substring
    (7, "http://good.org/fine"),
    (8, "doc://12345"),                        # opaque key: no host, never blocked
    (9, "http://com/degenerate"),              # single-label host == entry 'com'? no such entry
    (10, "https://ads.tracker.net:8443/y"),    # non-default port kept, host still matches
]
BLOCKED = ["example.com", "ads.tracker.net", "WWW.Spam.IO ", ""]


def _canon_host(url: str) -> str:
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)", url)
    if not m:
        return ""
    scheme, host = m.group(1).lower(), m.group(2).lower()
    if scheme == "http":
        host = re.sub(r":80$", "", host)
    elif scheme == "https":
        host = re.sub(r":443$", "", host)
    host = re.sub(r"^www\.", "", host)
    # blocklist matching is port-blind (the operator strips any port)
    return re.sub(r":[0-9]+$", "", host)


def _oracle_blocked(docs, blocked):
    entries = {b.strip().lower() for b in blocked} - {""}
    out = set()
    for doc_id, url in docs:
        host = _canon_host(url)
        if not host:
            continue
        labels = host.split(".")
        sufs = {".".join(labels[i:]) for i in range(len(labels))}
        if sufs & entries:
            out.add(doc_id)
    return out


def test_host_suffixes(spark):
    rows = spark.range(1).select(
        host_suffixes(F.lit("a.b.example.com")).alias("s"),
        host_suffixes(F.lit("")).alias("empty"),
        host_suffixes(host_col(F.lit("not a url"))).alias("nonurl"),
        # scheme-syntax strings DO carry an authority ("123" here) — a
        # domain blocklist can't match it (no dot-suffix in any entry),
        # which the oracle test pins end to end
        host_suffixes(host_col(F.lit("doc://123"))).alias("opaque"),
    ).collect()[0]
    assert rows["s"] == ["a.b.example.com", "b.example.com", "example.com", "com"]
    assert rows["empty"] == []
    assert rows["nonurl"] == []
    assert rows["opaque"] == ["123"]


def test_filter_blocked_hosts_matches_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, url string")
    bl = spark.createDataFrame([(b,) for b in BLOCKED], "domain string")
    want_blocked = _oracle_blocked(DOCS, BLOCKED)
    assert want_blocked == {1, 2, 3, 4, 10}  # the case list stays honest
    got_blocked = {
        r["doc_id"] for r in blocked_doc_ids(docs, bl).collect()
    }
    assert got_blocked == want_blocked
    kept = filter_blocked_hosts(docs, bl)
    assert {r["doc_id"] for r in kept.collect()} == (
        {d for d, _ in DOCS} - want_blocked
    )
    assert kept.columns == docs.columns
    # idempotent: filtering the survivors again drops nothing
    again = filter_blocked_hosts(kept, bl)
    assert again.count() == kept.count()


def test_blocklist_plan_broadcasts_entries(spark):
    """The corpus side must never shuffle to discover blocked ids: the
    entry table broadcasts into the semi join."""
    docs = spark.createDataFrame(DOCS, "doc_id long, url string")
    bl = spark.createDataFrame([(b,) for b in BLOCKED], "domain string")
    plan = blocked_doc_ids(docs, bl)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan.split("LeftSemi")[0]
