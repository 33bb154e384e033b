"""Text normalization, tokenization, shingling, and HTML text extraction.

The canonicalization role of the reference's color-normalize + resize stage
(/root/reference/duplicate-detector.py:850-925, "make near-dups hash-close")
is played here by: lowercase -> collapse non-alphanumerics to single spaces
-> whitespace word split -> k-word shingles.

Every transformation exists twice, intentionally:
  * a JVM column expression (whole-stage codegen; the production path), and
  * a pure-Python mirror (``py_*``) used by the brute-force test oracle —
    the analog of the reference's single-node semantics.
Tests assert the two agree token-for-token, which is what lets the DuckDB
oracle SQL (same regex, same split) hash-match the Spark output.

HTML -> text extraction is an Arrow-batched ``mapInPandas`` function (the
analog of the reference's metadata-extraction worker pool, ref :647-680,
1305-1344) and must reproduce the ``text`` column byte-identically per url
(input-hint invariant).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

# One token pattern, used verbatim on all three sides (Spark / Python / DuckDB).
TOKEN_SPLIT_REGEX = r"[^a-z0-9]+"
_PY_TOKEN_SPLIT = re.compile(TOKEN_SPLIT_REGEX)
# the complement class, single pass: findall('[a-z0-9]+') returns exactly
# the non-empty fields sub('[^a-z0-9]+',' ')+split would — same maximal
# alphanumeric runs — without building the intermediate string (measured
# 1.6x on the signature hot path; equivalence fuzzed in
# tests/test_tokenizer_fuzz.py)
_PY_TOKEN_FIND = re.compile(r"[a-z0-9]+")
_PY_PARAGRAPH = re.compile(r"<p>(.*?)</p>", re.DOTALL)


# ---------------------------------------------------------------------------
# JVM column expressions
# ---------------------------------------------------------------------------

def words_col(text: Column | str) -> Column:
    """array<string> of lowercase alphanumeric tokens."""
    c = F.col(text) if isinstance(text, str) else text
    split = F.split(F.regexp_replace(F.lower(c), TOKEN_SPLIT_REGEX, " "), " ")
    return F.filter(split, lambda x: x != F.lit(""))


def shingles_col(words: Column, k: int) -> Column:
    """Distinct k-word shingles (space-joined); empty array if < k words."""
    mk = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )
    return F.when(F.size(words) >= k, mk).otherwise(
        F.array().cast("array<string>")
    )


def text_sha256_col(text: Column | str) -> Column:
    """Exact-tier key: sha256 over the raw text bytes (M3 analog; the
    reference's pipe-joined metadata key, ref :682-702)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.sha2(c, 256)


# ---------------------------------------------------------------------------
# Pure-Python mirrors (test oracle)
# ---------------------------------------------------------------------------

def py_tokenize(text: str) -> list[str]:
    return _PY_TOKEN_FIND.findall(text.lower())


def py_shingles(words: list[str], k: int) -> set[str]:
    if len(words) < k:
        return set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


# ---------------------------------------------------------------------------
# HTML -> text extraction (mapInPandas)
# ---------------------------------------------------------------------------

def py_extract_text(html: bytes) -> str:
    """Pure function of the html bytes; must equal the table's ``text``
    column byte-for-byte (fixture generator writes both from one source)."""
    return "\n".join(_PY_PARAGRAPH.findall(html.decode("utf-8")))


EXTRACT_SCHEMA = "url string, text string"


def extract_text_map_in_pandas(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """mapInPandas body: (url, html binary) -> (url, text).

    Corrupt-row tolerance per the reference (ref :948-949, 509-512): a row
    that fails to decode yields null text instead of failing the job;
    downstream stages filter nulls.
    """
    import pandas as pd

    for pdf in batches:
        texts: list[str | None] = []
        for raw in pdf["html"]:
            try:
                texts.append(py_extract_text(bytes(raw)))
            except Exception:
                texts.append(None)
        yield pd.DataFrame({"url": pdf["url"], "text": texts})


def extract_text(pages_df) -> "object":
    """(url, html, ...) -> (url, text) via Arrow-batched extraction.

    Projects ``html`` away immediately (SURVEY §4: never drag the binary
    column through a shuffle)."""
    return pages_df.select("url", "html").mapInPandas(
        extract_text_map_in_pandas, schema=EXTRACT_SCHEMA
    )
