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
