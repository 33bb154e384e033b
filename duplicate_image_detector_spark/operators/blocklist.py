"""Domain-blocklist filtering — the standard webtext admission gate.

C4, RefinedWeb, and Dolma all drop documents whose host falls under a
curated blocklist (UT1-style: ~10^6 registrable domains, an entry
blocking every subdomain beneath it).  The reference has no analog —
its corpus is a local photo library — but the brief's crawl pipeline
needs the gate before any dedup tier spends work on pages that will be
discarded.

Scale-honest design (10^12 docs x 10^6 blocked domains):

  * the containment test ("host is the entry or a subdomain of it")
    becomes EQUALITY by expanding each host into its <= ~10 dot-suffixes
    (``functions/urls.py host_suffixes``) — a constant-factor narrow
    map, no regex-per-entry, no broadcast nested-loop join;
  * the blocklist broadcasts (10^6 short strings ~ tens of MB) and the
    exploded suffix stream left-semi joins it — the corpus side never
    shuffles to discover which ids are blocked;
  * the final ``left_anti`` keys on ``doc_id``; the blocked-id set is
    normally a small fraction of the corpus, so AQE broadcasts it and
    the whole filter is shuffle-free end to end.  When the drop
    fraction is genuinely huge the anti-join degrades to an id shuffle,
    which is proportional to the data being dropped — unavoidable.

Matching uses the canonical host (lowercased, ``www.``/default-port
stripped), so ``WWW.Example.COM:443`` is blocked by ``example.com``.
Blocklist entries are canonicalized the same way defensively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.urls import (
    host_col,
    host_suffixes,
)


def blocked_doc_ids(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """docs(..., url, doc_id) x blocklist(domain) -> (doc_id) of documents
    whose canonical host equals, or is a subdomain of, any blocked domain.
    """
    entries = (
        blocklist.select(
            F.lower(F.trim(F.col(domain_col))).alias("suffix")
        )
        .where(F.col("suffix") != "")
        .distinct()
    )
    # a blocked domain is blocked on EVERY port — strip any port (host_col
    # strips only scheme-default ones, which matters for URL identity but
    # not for admission)
    host = F.regexp_replace(host_col(url_col), ":[0-9]+$", "")
    sufs = docs.select(
        F.col(id_col),
        F.explode(host_suffixes(host)).alias("suffix"),
    ).where(F.col("suffix") != "")
    return (
        sufs.join(F.broadcast(entries), "suffix", "left_semi")
        .select(id_col)
        .distinct()
    )


def filter_blocked_hosts(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """docs minus every document under a blocked domain (schema
    unchanged).  Idempotent; opaque non-URL keys are never blocked."""
    bad = blocked_doc_ids(docs, blocklist, url_col, id_col, domain_col)
    return docs.join(bad, id_col, "left_anti")
