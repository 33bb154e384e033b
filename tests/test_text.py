"""Tokenization parity (JVM vs Python) and byte-identical extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.text import (
    extract_text,
    py_extract_text,
    py_shingles,
    py_tokenize,
    shingles_col,
    words_col,
)

SAMPLES = [
    "Hello, World! 42 times.",
    "  multiple   spaces\tand\nnewlines ",
    "UPPER lower MiXeD",
    "punct-only !!! ...",
    "",
    "a b c d e f g",
    "ünïcode statt ascii",
]


def test_tokenize_parity(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i int, text string")
    got = {
        r["i"]: r["w"]
        for r in df.select("i", words_col(F.col("text")).alias("w")).collect()
    }
    for i, s in enumerate(SAMPLES):
        assert got[i] == py_tokenize(s), f"mismatch on {s!r}"


def test_shingles_parity(spark):
    k = 5
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i int, text string")
    w = words_col(F.col("text"))
    got = {
        r["i"]: set(r["sh"])
        for r in df.select("i", shingles_col(w, k).alias("sh")).collect()
    }
    for i, s in enumerate(SAMPLES):
        assert got[i] == py_shingles(py_tokenize(s), k)


def test_extraction_byte_identity(spark, tiny_pages_df, tiny_corpus):
    """The html->text UDF must reproduce the stored text byte-for-byte
    (input-hint invariant)."""
    pages, _ = tiny_corpus
    extracted = extract_text(tiny_pages_df).toPandas().set_index("url")["text"]
    for _, row in pages.iterrows():
        assert extracted[row["url"]] == row["text"]


def test_py_extract_pure_function(tiny_corpus):
    pages, _ = tiny_corpus
    for _, row in pages.head(20).iterrows():
        assert py_extract_text(bytes(row["html"])) == row["text"]


# adversarial markup: the cases real Common-Crawl HTML throws at an
# extractor (the reference's analog is its 3-fallback EXIF chain,
# ref duplicate-detector.py:647-680)
ADVERSARIAL = [
    # entity + charref decoding
    (
        b"<html><body><p>a &amp; b &lt;c&gt; &#233;t&eacute;</p></body></html>",
        "a & b <c> \xe9t\xe9",
    ),
    # inline tags don't split paragraphs; block tags do
    (b"<p>one<b>two</b> three</p><p>four</p>", "onetwo three\nfour"),
    (b"<div>x<br>y</div>", "x\ny"),
    (b"<ul><li>a</li><li>b</li></ul>", "a\nb"),
    # missing </head>: auto-closed at <body>, title never leaks into text
    (b"<html><head><title>T</title><body><p>kept</p>", "kept"),
    # script/style/comment stripping, incl. markup-looking script payload
    (b"<script>var a = '<p>no</p>';</script><p>yes</p>", "yes"),
    (b"<style>p{color:red}</style><p>z</p>", "z"),
    (b"<!-- <p>ghost</p> --><p>real</p>", "real"),
    # encoding fallback chain: utf-8 first, then cp1252/latin-1
    (b"<p>u\xc3\xa9</p>", "u\xe9"),
    (b"<p>u\xe9</p>", "u\xe9"),
    # broken nesting / unclosed tags never raise
    (b"<p>broken <b>nest</p></i> tail", "broken nest\ntail"),
    # a partial tag truncated at EOF surfaces as literal data (HTMLParser's
    # tolerant close()) rather than raising
    (b"<p>unterminated <b", "unterminated <b"),
    # NBSP and whitespace runs collapse inside a paragraph
    (b"<p>a&nbsp;&nbsp;b</p>", "a b"),
    (b"<p>  a \t b\n c  </p>", "a b c"),
    (b"", ""),
    # truncated crawl: unclosed <head>, no <body> — the first block-level
    # start tag implicitly closes head (browser behavior); page not empty
    (b"<html><head><title>t</title><p>kept text</p>", "kept text"),
    (b"<head><meta charset=utf-8><div>body text</div>", "body text"),
    # unterminated <script>: remainder is script PAYLOAD and stays dropped
    # (recovering it would inject code into extracted text)
    (b"<p>before</p><script>var x = 'tail", "before"),
]


def test_extract_adversarial_html():
    for raw, want in ADVERSARIAL:
        got = py_extract_text(raw)
        assert got == want, f"{raw!r} -> {got!r}, want {want!r}"


def test_extract_adversarial_html_spark_parity(spark):
    """The mapInPandas UDF and the pure function agree on adversarial
    markup (corrupt rows -> null, never a crash)."""
    rows = [(f"u{i}", raw) for i, (raw, _) in enumerate(ADVERSARIAL)]
    rows.append(("u_null", None))
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r["text"] for r in extract_text(df).collect()}
    for i, (_, want) in enumerate(ADVERSARIAL):
        assert got[f"u{i}"] == want
    assert got["u_null"] is None
