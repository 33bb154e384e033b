"""PII scrubbing — the redaction pass every released webtext pipeline
runs before training (Dolma's anonymization stage is the public analog:
emails, phone numbers, IP addresses replaced by sentinel tokens).

Pure JVM expressions: `regexp_replace` + `regexp_count` per category,
fully codegen'd, no UDF — at 100 TB this stage is a map over the text
column with zero shuffle, so the only design question is the regex set.
The patterns are written in the Java-regex / RE2 common subset so the
DuckDB oracle applies the SAME pattern strings byte-for-byte:

  * EMAIL — local@domain.tld (the practical form, not RFC 5322);
  * IPV4  — dotted quad with word boundaries;
  * PHONE — international ``+`` form only (``+``, 7-15 digits):
    national formats collide with prices/ids/dates at webtext scale and
    belong to a locale-aware pass, not a global regex.

Replacement sentinels are fixed-alphabet (``|||EMAIL|||`` etc.) and
cannot re-match any pattern, so the scrub is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # category -> (regex, sentinel)
    "email": (
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
        "|||EMAIL|||",
    ),
    "ipv4": (
        "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
        "|||IP|||",
    ),
    "phone": (
        "\\+[0-9]{7,15}",
        "|||PHONE|||",
    ),
}


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(..., text) -> same rows with ``text`` redacted and one
    ``n_<category>`` count column per pattern (counts are pre-redaction
    match counts — the audit trail the deletion-log design note asks
    for: scrubbing must not silently report clean documents)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.regexp_count(t, F.lit(rx)).alias(f"n_{name}")
        for name, (rx, _) in PII_PATTERNS.items()
    ]
    red = t
    for name, (rx, token) in PII_PATTERNS.items():
        red = F.regexp_replace(red, rx, token)
    others = [c for c in docs.columns if c != text_col]
    return docs.select(*others, *counts, red.alias(text_col))
