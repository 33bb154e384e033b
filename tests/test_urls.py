"""URL canonicalization: rule-by-rule cases, idempotence, grouping."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.urls import (
    canonical_url_col,
    url_variant_groups,
)

CASES = [
    # scheme/host case, default port, www, tracking, fragment, trailing
    # slash, query order — all at once
    ("HTTP://WWW.Example.com:80/a/b/?utm_source=x&z=1&a=2#frag",
     "http://example.com/a/b?a=2&z=1"),
    ("https://Example.org:443/", "https://example.org"),
    # non-default port is identity-relevant: kept
    ("https://example.org:8443/x", "https://example.org:8443/x"),
    ("http://site.com/path?gclid=abc&fbclid=d", "http://site.com/path"),
    ("http://site.com/path?ref=nav&real=1", "http://site.com/path?real=1"),
    # no-path URLs
    ("http://www.a.com?b=1&a=1", "http://a.com?a=1&b=1"),
    ("HTTPS://WWW.A.COM:443?utm_campaign=", "https://a.com"),
    # inner double slash kept, trailing run stripped
    ("http://a.com//x//", "http://a.com//x"),
    # opaque keys and non-URLs pass through unchanged
    ("doc://12345", "doc://12345"),
    ("not a url", "not a url"),
    # a '?' INSIDE the fragment is fragment text, not a query (RFC 3986:
    # the query ends at the first '#') — must not be promoted to params
    ("http://a.com/p#frag?x=1", "http://a.com/p"),
    ("http://a.com/p?a=1#f?b=2", "http://a.com/p?a=1"),
]


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonical_url_col("url").alias("c")).collect()
    ]


def test_canonicalization_rules(spark):
    got = _canon(spark, [u for u, _ in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_idempotent(spark):
    once = _canon(spark, [u for u, _ in CASES])
    twice = _canon(spark, once)
    assert once == twice


def test_variant_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.com/p?x=1"),
            (2, "HTTP://WWW.A.com:80/p/?x=1&utm_source=z"),
            (3, "http://a.com/p?x=2"),  # different real param: own group
        ],
        "doc_id long, url string",
    )
    got = {
        r["canon_url"]: (r["n_docs"], r["rep_doc_id"])
        for r in url_variant_groups(df).collect()
    }
    assert got == {"http://a.com/p?x=1": (2, 1)}
