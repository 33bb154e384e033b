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
from html.parser import HTMLParser
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


# ---------------------------------------------------------------------------
# JVM column expressions
# ---------------------------------------------------------------------------

def words_col(text: Column | str) -> Column:
    """array<string> of lowercase alphanumeric tokens."""
    c = F.col(text) if isinstance(text, str) else text
    split = F.split(F.regexp_replace(F.lower(c), TOKEN_SPLIT_REGEX, " "), " ")
    return F.filter(split, lambda x: x != F.lit(""))


def grams_col(words: Column, k: int) -> Column:
    """All k-word grams in order, with multiplicity (space-joined);
    empty array if < k words.

    Built as a zip_with chain over k shifted slices — NOT as
    ``transform(sequence(...), lambda i: ...slice(words, i+1, k))``.
    The transform form references the ``words`` expression inside the
    per-element lambda, and Catalyst re-evaluates the referenced
    subtree PER ELEMENT: when ``words`` is an unmaterialized
    ``words_col(text)`` the whole lower+regexp+split+filter chain runs
    once per word, O(n_words x text_len) per document — measured 100x
    slower on 4.6 KB pages (62 s -> 0.6 s for 116k bigrams).  The
    zip_with form references ``words`` 2k times per ROW, a constant.
    """
    n = F.greatest(F.size(words) - (k - 1), F.lit(0))
    acc = F.slice(words, 1, n)
    for j in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(words, 1 + j, n),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(words) >= k, acc).otherwise(
        F.array().cast("array<string>")
    )


def shingles_col(words: Column, k: int) -> Column:
    """Distinct k-word shingles (space-joined); empty array if < k words."""
    return F.when(
        F.size(words) >= k, F.array_distinct(grams_col(words, k))
    ).otherwise(F.array().cast("array<string>"))


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

# content inside these elements is never text (script/style payloads,
# invisible templates); ``head`` is handled separately (auto-closed)
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
# elements that terminate the current paragraph; inline markup (<b>, <a>,
# <span>, ...) does NOT split text
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
        "section", "article", "header", "footer", "nav", "aside", "form",
        "hr", "dl", "dt", "dd", "figure", "figcaption", "main", "body",
    }
)


class _TextExtractor(HTMLParser):
    """Tolerant HTML -> paragraph extractor (stdlib parser, no deps).

    Semantics (deterministic, documented — the cross-row invariant the
    fixture generator and tests hold the engine to):
      * character/entity references decoded (``convert_charrefs=True``);
      * comments, processing instructions, and everything inside
        ``_SKIP_TAGS`` dropped;
      * ``head`` content dropped; a missing ``</head>`` is auto-closed at
        ``<body>`` OR at the first block-level start tag (browser
        behavior, survives truncated markup);
      * data inside an UNTERMINATED ``<script>``/``<style>`` stays
        dropped through EOF — deliberate: that data is script payload,
        and "recovering" it would inject code into extracted text
        (browsers swallow it the same way);
      * block-element boundaries split paragraphs; inline tags don't;
      * within a paragraph, whitespace runs (incl. NBSP) collapse to one
        space; paragraphs join with ``\\n``.
    Unclosed/mis-nested tags never raise — HTMLParser is tolerant and the
    skip state is depth-counted per tag name.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._in_head = False
        self._buf: list[str] = []
        self.paragraphs: list[str] = []

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.paragraphs.append(text)
        self._buf.clear()

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "head":
            self._in_head = True
        elif tag == "body" or (self._in_head and tag in _BLOCK_TAGS):
            # auto-close a dangling <head>: browsers implicitly open
            # <body> at the first block-level start tag, so truncated
            # markup that never writes </head> or <body> (a real
            # Common-Crawl shape) must not drop the whole page
            self._in_head = False
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag == "head":
            self._in_head = False
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if not self._skip and not self._in_head:
            self._buf.append(data)


def py_decode_html(html: bytes) -> str:
    """3-fallback decode chain, mirroring the reference's metadata
    extraction fallbacks (ref :647-680): strict utf-8, then cp1252 (the
    de-facto web superset of latin-1), then latin-1 with replacement —
    the last never fails, so decode errors can't kill a partition."""
    for enc, errors in (("utf-8", "strict"), ("cp1252", "strict")):
        try:
            return html.decode(enc, errors)
        except (UnicodeDecodeError, ValueError):
            continue
    return html.decode("latin-1", "replace")


def py_extract_text(html: bytes) -> str:
    """Pure function of the html bytes; must equal the table's ``text``
    column byte-for-byte (fixture generator writes both from one source;
    adversarial-markup tests in tests/test_text.py)."""
    parser = _TextExtractor()
    parser.feed(py_decode_html(html))
    parser.close()
    parser._flush()  # text after the last block boundary
    return "\n".join(parser.paragraphs)


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
