"""URL canonicalization — crawl-pipeline key derivation (M3 family).

The same page is crawled under many spellings: scheme/host case, default
ports, ``www.``, fragments, tracking parameters (``utm_*``, ``gclid``,
``fbclid``, ``ref``), query-parameter order, trailing slashes.  Keying
documents by the RAW url splits one page's history across doc_ids and
defeats every downstream dedup tier, so canonicalization runs before
``xxhash64(url)`` key derivation (the reference's analog is path
normalization before its cache key, /root/reference/duplicate-detector.py
:439-451 — same idea, filesystem edition).

Pure JVM column expressions (regexp + array HOFs): no UDF, fully
codegen'd, usable inside any projection.  Rules, in order:

  * scheme and host lowercased; fragment dropped;
  * default port stripped (``:80`` for http, ``:443`` for https);
  * leading ``www.`` stripped;
  * tracking params removed (``utm_*``, ``gclid``, ``fbclid``, ``ref``);
  * surviving query params sorted bytewise; empty query -> no ``?``;
  * trailing path slashes stripped.

A string that does not look like ``scheme://...`` is passed through
unchanged (opaque keys like ``doc://123`` stay stable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# kept deliberately simple so the Java (Spark) and RE2 (DuckDB oracle)
# regex dialects agree character-for-character
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored after authority+path: a bare "\\?([^#]*)" would match the
# first '?' ANYWHERE, promoting fragment content into the query when
# the fragment itself contains '?' (http://a/p#frag?x=1) — RFC 3986
# says the query ends at the first '#', so such a '?' is fragment text
_QUERY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^#?]*\\?([^#]*)"
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="


def canonical_url_col(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module rules (pure expression)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_replace(
        F.regexp_extract(u, _PATH_RE, 1), "/+$", ""
    )
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(u, _QUERY_RE, 1), "&", -1),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme != "", canon).otherwise(u)


def host_col(url: Column | str) -> Column:
    """Canonical host of ``url``: lowercased, default port and leading
    ``www.`` stripped — the same host rules ``canonical_url_col`` applies.
    Empty string for values that don't look like ``scheme://...``."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    return F.regexp_replace(host, "^www\\.", "")


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of ``host``: ``a.b.example.com`` ->
    ``[a.b.example.com, b.example.com, example.com, com]``.  Blocklists
    name domains at arbitrary depth, and an entry blocks every
    subdomain under it — suffix expansion turns that containment test
    into plain equality joins.  Bounded work: a host has <= ~10 labels,
    so this is a constant-factor narrow map, never a blowup.  Empty
    host -> empty array (opaque keys like ``doc://123`` match nothing).
    """
    labels = F.split(host, "\\.")
    n = F.size(labels)
    sufs = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    return F.when(host == "", F.array().cast("array<string>")).otherwise(sufs)


def url_variant_groups(
    docs: DataFrame, url_col: str = "url", min_size: int = 2
) -> DataFrame:
    """docs(..., url) -> (canon_url, n_docs, rep_doc_id) for canonical
    URLs carrying >= ``min_size`` raw spellings — the URL-level exact
    tier (group + HAVING + min-id representative, the A1/J3 shape;
    partial-aggregating groupBy, no window)."""
    return (
        docs.select(
            canonical_url_col(url_col).alias("canon_url"), "doc_id"
        )
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .where(F.col("n_docs") >= F.lit(min_size))
    )
