"""Cross-engine tokenizer fuzz: Spark words_col == py_tokenize == DuckDB
on adversarial random strings.  Every gate's hash-exactness rests on this
three-way parity, so it gets fuzzed beyond the fixtures: unicode letters
(must NOT count as [a-z0-9]), digits, punctuation runs, empty/whitespace,
long repeats."""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.text import (
    py_tokenize,
    words_col,
)

_ALPHABETS = [
    string.ascii_lowercase,
    string.ascii_uppercase,
    string.digits,
    " \t\n-_.,;!?/\\'\"()[]",
    "äöüßéèñçØλπ中文字テスト",   # non-ascii letters: never tokens
    "00a1b2",
]


def _random_strings(n: int, seed: int = 1234) -> list[str]:
    rng = random.Random(seed)
    out = [""]
    out.append(" " * 7)
    out.append("...---...")
    out.append("a" * 500)
    out.append(("ab " * 50).strip())
    while len(out) < n:
        parts = []
        for _ in range(rng.randint(1, 40)):
            ab = rng.choice(_ALPHABETS)
            parts.append("".join(rng.choice(ab) for _ in range(rng.randint(1, 8))))
        out.append("".join(parts))
    return out


def test_tokenizer_three_way_parity(spark):
    texts = _random_strings(300)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got_spark = {
        r["i"]: list(r["w"])
        for r in df.select("i", words_col(F.col("text")).alias("w")).collect()
    }
    got_py = {i: py_tokenize(t) for i, t in enumerate(texts)}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    got_duck = {
        i: w
        for i, w in con.execute(
            "SELECT i, list_filter(string_split(regexp_replace(lower(text),"
            " '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') FROM t"
        ).fetchall()
    }

    assert got_spark == got_py
    assert got_duck == got_py
