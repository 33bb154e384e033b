"""The NumPy (pandas) and column-expression (sql) signature stages must
produce identical rows — one semantics, two physical implementations."""

from __future__ import annotations

from duplicate_image_detector_spark.operators.signatures import (
    compute_signatures,
)


def _rows(df):
    return {
        r["doc_id"]: (
            r["text_sha256"],
            r["n_tokens"],
            r["n_shingles"],
            tuple(r["shingle_hashes"]),
            tuple(r["minhash"]),
            r["simhash"],
        )
        for r in df.collect()
    }


def test_pandas_matches_sql_signatures(spark, tiny_pages_df, cfg):
    from pyspark.sql import functions as F

    docs = tiny_pages_df.select(
        F.xxhash64("url").alias("doc_id"), "text"
    ).limit(60)
    got = _rows(compute_signatures(docs, cfg, method="pandas"))
    want = _rows(compute_signatures(docs, cfg, method="sql", hash_kind="md5"))
    assert got == want
    assert len(got) > 0
