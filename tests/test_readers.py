"""Source readers: parquet / JSON-lines / CSV all normalize to one schema
and feed the pipeline with identical results."""

from __future__ import annotations


from pyspark.sql import functions as F

from duplicate_image_detector_spark.sources.readers import (
    PAGES_SCHEMA,
    read_pages,
)


def _expected(tiny_pages_df):
    return {
        (r["url"], r["text"])
        for r in tiny_pages_df.select("url", "text").collect()
    }


def test_parquet_json_csv_same_rows(spark, tiny_pages_df, tmp_path):
    want = _expected(tiny_pages_df)

    pq = str(tmp_path / "pages_pq")
    tiny_pages_df.write.parquet(pq)
    got_pq = read_pages(spark, pq, "parquet")
    assert got_pq.schema == PAGES_SCHEMA
    assert _expected(got_pq) == want

    js = str(tmp_path / "pages_json")
    # JSON carries binary as base64 implicitly via Spark's writer? No —
    # drop html for the JSON interchange copy (text is authoritative)
    tiny_pages_df.drop("html").write.json(js)
    got_js = read_pages(spark, js, "json")
    assert got_js.schema == PAGES_SCHEMA
    assert _expected(got_js) == want
    assert got_js.where(F.col("html").isNotNull()).count() == 0  # typed null

    # CSV: single-line-text export (embedded newlines need multiLine
    # parsing, which kills input splittability — out of scope for the
    # splittable reader); html travels as base64
    cs = str(tmp_path / "pages_csv")
    single_df = tiny_pages_df.withColumn(
        "text", F.regexp_replace(F.col("text"), "\n", " ")
    )
    # Spark's base64 emits MIME-chunked output (newline every 76 chars) —
    # strip the breaks so each CSV record stays one physical line
    b64_one_line = F.regexp_replace(F.base64(F.col("html")), "[\\r\\n]", "")
    single_df.select(
        "url",
        "warc_ts",
        b64_one_line.alias("html_b64"),
        "text",
        "lang",
    ).write.option("header", "true").csv(cs)
    got_cs = read_pages(spark, cs, "csv")
    assert got_cs.schema == PAGES_SCHEMA
    assert _expected(got_cs) == _expected(single_df)
    # html round-trips through base64
    one = got_cs.where(F.col("html").isNotNull()).select("url", "html").first()
    src = dict(
        (r["url"], r["html"]) for r in tiny_pages_df.select("url", "html").collect()
    )
    assert bytes(one["html"]) == bytes(src[one["url"]])


def test_pipeline_source_agnostic(spark, tiny_pages_df, cfg, tmp_path):
    """Same clusters from a parquet copy and a JSON copy of the corpus."""
    from duplicate_image_detector_spark.plans.pipeline import run_pipeline

    c = cfg.with_recall_banding()
    pq = str(tmp_path / "src_pq")
    js = str(tmp_path / "src_js")
    tiny_pages_df.write.parquet(pq)
    tiny_pages_df.drop("html").write.json(js)

    r_pq = run_pipeline(
        spark, read_pages(spark, pq, "parquet"), c, enable_substring=False
    )
    r_js = run_pipeline(
        spark, read_pages(spark, js, "json"), c, enable_substring=False
    )
    a = {
        (r["url"], r["cluster_id"])
        for r in r_pq.clusters.select("url", "cluster_id").collect()
    }
    b = {
        (r["url"], r["cluster_id"])
        for r in r_js.clusters.select("url", "cluster_id").collect()
    }
    assert a == b and len(a) > 0


def test_csv_reordered_columns_and_bad_base64(spark, tmp_path):
    """CSV columns are matched by NAME (a user schema would bind them by
    position and load fields crosswise); malformed base64 degrades to a
    null html, not a job failure."""
    p = str(tmp_path / "reordered")
    rows = [
        ("hello world text", "en", "https://a.com/x", "aGk="),       # "hi"
        ("more text here", "de", "https://b.com/y", "!!!not-b64!!!"),
    ]
    spark.createDataFrame(
        rows, "text string, lang string, url string, html_b64 string"
    ).write.option("header", "true").csv(p)
    got = {r["url"]: r for r in read_pages(spark, p, "csv").collect()}
    assert got["https://a.com/x"]["text"] == "hello world text"
    assert got["https://a.com/x"]["lang"] == "en"
    assert bytes(got["https://a.com/x"]["html"]) == b"hi"
    assert got["https://b.com/y"]["html"] is None  # bad b64 -> typed null


def test_csv_malformed_timestamp_degrades_to_null(spark, tmp_path):
    """ANSI mode: a non-ISO warc_ts cell must become a null, not abort the
    job (try_cast in _normalize); uppercase headers match case-insensitively."""
    p = str(tmp_path / "badts")
    spark.createDataFrame(
        [("https://a.com", "02/01/2024 03:04", "some text"),
         ("https://b.com", "2024-02-01 03:04:05", "more text")],
        "URL string, WARC_TS string, TEXT string",
    ).write.option("header", "true").csv(p)
    got = {r["url"]: r for r in read_pages(spark, p, "csv").collect()}
    assert got["https://a.com"]["warc_ts"] is None       # malformed -> null
    assert got["https://a.com"]["text"] == "some text"   # row survives
    assert got["https://b.com"]["warc_ts"] is not None   # valid parses
