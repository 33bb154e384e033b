"""Bigram-LM scoring, sequence packing, stratified sampling: exact
fixtures, edge cases (short docs, absent strata), determinism across
parallelism, and plan audits (broadcast where promised, no corpus
shuffle in the sampler)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_image_detector_spark.operators.lm_filter import (
    score_bigram_lm,
    train_bigram_lm,
)
from duplicate_image_detector_spark.operators.packing import pack_sequences
from duplicate_image_detector_spark.operators.sampling import (
    sample_hash_col,
    stratified_sample,
)


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------

def test_train_bigram_lm_counts(spark):
    ref = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")], "doc_id long, text string"
    )
    m = {(r["w1"], r["w2"]): (r["c12"], r["c1"]) for r in train_bigram_lm(ref).collect()}
    # "a b" occurs 3x; left-word "a" occurs 3x; left-word "b" occurs 3x
    assert m[("a", "b")] == (3, 3)
    assert m[("b", "a")] == (1, 3)
    assert m[("b", "c")] == (1, 3)
    assert m[("b", "x")] == (1, 3)
    assert len(m) == 4


def test_score_bigram_lm_exact_and_oov(spark):
    ref = spark.createDataFrame([(1, "a b a b c")], "doc_id long, text string")
    model = train_bigram_lm(ref)  # p(b|a)=1, p(a|b)=1/3, p(c|b)=1/3... wait
    docs = spark.createDataFrame(
        [
            (10, "a b c"),      # "a b" p=2/2=1.0; "b c" p=1/2
            (11, "a zz b"),     # both bigrams OOV
            (12, "single"),     # < 2 words -> (0, 0, 0)
            (13, None),         # corrupt row -> (0, 0, 0)
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in score_bigram_lm(docs, model).collect()}
    # model from "a b a b c": c12(a,b)=2 c1(a)=2; c12(b,a)=1, c12(b,c)=1, c1(b)=2
    assert (got[10]["n_bigrams"], got[10]["n_oov"]) == (2, 0)
    assert got[10]["sum_p_micro"] == 1_000_000 + 500_000
    assert (got[11]["n_bigrams"], got[11]["n_oov"], got[11]["sum_p_micro"]) == (2, 2, 0)
    assert (got[12]["n_bigrams"], got[12]["n_oov"], got[12]["sum_p_micro"]) == (0, 0, 0)
    assert (got[13]["n_bigrams"], got[13]["n_oov"], got[13]["sum_p_micro"]) == (0, 0, 0)


def test_bigram_lm_probabilities_normalize(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat", "the cat ran", "a cat sat the mat"]
        )],
        "doc_id long, text string",
    )
    rows = train_bigram_lm(ref).collect()
    by_w1: dict[str, list] = {}
    for r in rows:
        by_w1.setdefault(r["w1"], []).append(r)
    for w1, grp in by_w1.items():
        # c1 really is "count of w1 as a left word": MLE p(.|w1) sums to 1
        assert sum(r["c12"] for r in grp) == grp[0]["c1"], w1
        assert all(r["c1"] == grp[0]["c1"] for r in grp)


def test_bigram_lm_hash_keys_equivalent(spark):
    # the int64-keyed shuffle path scores identically on a
    # collision-free corpus (collisions ~ n^2/2^65)
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common w{(i * 3) % 11} tail word soup here w{i % 5}")
         for i in range(60)],
        "doc_id long, text string",
    )
    ref = docs.where("doc_id % 2 = 0")
    slow = score_bigram_lm(docs, train_bigram_lm(ref)).collect()
    fast = score_bigram_lm(docs, train_bigram_lm(ref, hash_keys=True)).collect()
    assert sorted(map(tuple, slow)) == sorted(map(tuple, fast))


def test_bigram_lm_two_phase_c1_equivalent(spark):
    # the mega-left-word fallback (persisted c12 + groupBy/join instead
    # of a window, no single-task fan-in bound) is a pure plan change:
    # model rows and downstream scores must be identical in both key
    # modes
    import pytest

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common w{(i * 3) % 11} tail word soup here w{i % 5}")
         for i in range(60)],
        "doc_id long, text string",
    )
    ref = docs.where("doc_id % 2 = 0")
    for hk in (False, True):
        win = train_bigram_lm(ref, hash_keys=hk)
        two = train_bigram_lm(ref, hash_keys=hk, c1_mode="two_phase")
        assert sorted(map(tuple, win.collect())) == sorted(
            map(tuple, two.collect())
        )
        assert win.columns == two.columns
        assert sorted(map(tuple, score_bigram_lm(docs, two).collect())) == \
            sorted(map(tuple, score_bigram_lm(docs, win).collect()))
        two.unpersist()
    with pytest.raises(ValueError, match="c1_mode"):
        train_bigram_lm(ref, c1_mode="nope")


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_chunking(spark):
    # one shard so the layout is a single stream; budgets force a spill
    docs = spark.createDataFrame(
        [(0, "w " * 5), (1, "w " * 3), (2, "w " * 4), (3, "w " * 2)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in pack_sequences(docs, max_tokens=6, n_shards=1).collect()
    }
    # stream offsets: 0, 5, 8, 12 -> seqs 0, 0, 1, 2
    assert [(got[i]["seq"], got[i]["offset_in_seq"]) for i in range(4)] == [
        (0, 0), (0, 5), (1, 2), (2, 0)
    ]
    assert all(got[i]["shard"] == 0 for i in range(4))


def test_pack_sequences_sharding_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (1 + i % 7)) for i in range(100)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(docs, 16, n_shards=4).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), 16, n_shards=4).collect()))
    assert a == b  # partition-order independent
    shards = {t[2] for t in a}
    assert shards == {0, 1, 2, 3}
    # within a shard, offsets reconstruct the exclusive prefix sum
    for shard in shards:
        rows = sorted(t for t in a if t[2] == shard)
        run = 0
        for doc_id, n_tokens, _, seq, off in rows:
            assert seq == run // 16 and off == run % 16, doc_id
            run += n_tokens


def test_pack_sequences_integer_exact_beyond_2_53(spark):
    # seq uses integral `div`, not a double division: at a prefix sum of
    # 2^53 + 3 the double rounds to 2^53 + 4, so (off/2) would read
    # 2^52 + 2 while the exact answer is 2^52 + 1
    big = (1 << 53) + 3
    docs = spark.createDataFrame(
        [(0, big), (1, 5)], "doc_id long, n long"
    )
    got = {
        r["doc_id"]: r
        for r in pack_sequences(
            docs, max_tokens=2, n_shards=1, tokens_col="n"
        ).collect()
    }
    assert got[1]["seq"] == (1 << 52) + 1
    assert got[1]["offset_in_seq"] == 1


def test_host_keep_threshold_clamps_to_one(spark):
    # floor(cap*2^32 / host_count) rounds to 0 for an ultra-hot host
    # (host_count > cap*2^32) — the clamp keeps the minimum representable
    # fraction instead of silently dropping EVERY row of that host
    from duplicate_image_detector_spark.operators.sampling import (
        _host_keep_threshold,
    )

    df = spark.createDataFrame(
        [(10 * (1 << 32) + 1,), (10 * (1 << 32),), (100,)], "host_count long"
    )
    got = [
        r["t"]
        for r in df.select(
            _host_keep_threshold(10, F.col("host_count")).alias("t")
        ).collect()
    ]
    assert got[0] == 1          # clamped (would floor to 0)
    assert got[1] == 1          # exactly representable boundary
    assert got[2] == (10 * (1 << 32)) // 100


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def _docs_strata(spark, n=2000):
    return spark.createDataFrame(
        [(i, ["en", "de", "zh"][i % 3]) for i in range(n)],
        "doc_id long, lang string",
    )


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs_strata(spark)
    rates = spark.createDataFrame(
        [("en", 0.5), ("de", 0.1)], "lang string, fraction double"
    )
    kept = stratified_sample(docs, rates, ["lang"], default_fraction=0.25)
    rows = kept.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in rows}
    # ~667 per stratum; binomial 5-sigma bounds
    assert 270 <= by_lang["en"] <= 400
    assert 30 <= by_lang["de"] <= 110
    assert 110 <= by_lang["zh"] <= 220  # default fraction applied
    again = stratified_sample(
        docs.repartition(17), rates, ["lang"], default_fraction=0.25
    )
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, again.collect()))


def test_stratified_sample_zero_default_drops_unlisted(spark):
    docs = _docs_strata(spark, 300)
    rates = spark.createDataFrame([("en", 1.0)], "lang string, fraction double")
    kept = stratified_sample(docs, rates, ["lang"])
    assert kept.where(F.col("lang") != "en").count() == 0
    assert kept.count() == 100  # fraction 1.0 keeps every 'en' row


def test_sample_hash_range_and_spread(spark):
    df = spark.range(0, 5000).select(sample_hash_col(F.col("id")).alias("h"))
    stats = df.agg(
        F.min("h"), F.max("h"), F.countDistinct(F.col("h") % 2).alias("par")
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] < 2**32 and stats[2] == 2
    # the millionths coin is roughly uniform: 5000 ids, keep < 100000/1e6
    frac = df.where((F.col("h") % 1000000) < 100000).count() / 5000
    assert 0.07 < frac < 0.13


def test_sample_hash_negative_ids(spark):
    # Spark's % keeps the dividend sign: without pmod a negative id
    # hashes negative and its %1e6 coin passes EVERY fraction filter
    df = spark.createDataFrame(
        [(i,) for i in range(-3000, 0)], "doc_id long"
    ).withColumn("lang", F.lit("xx"))
    rates = spark.createDataFrame([("xx", 0.1)], "lang string, fraction double")
    kept = stratified_sample(df, rates, ["lang"])
    rows = kept.collect()
    assert all(0 <= r["sample_hash"] < 2**32 for r in rows)
    assert 200 <= len(rows) <= 420  # ~300 expected; all-3000 = the bug


def test_cap_per_host(spark):
    from duplicate_image_detector_spark.operators.sampling import cap_per_host

    docs = spark.createDataFrame(
        [(i, "hot" if i < 4000 else f"h{i % 97}") for i in range(5000)],
        "doc_id long, host string",
    )
    kept = cap_per_host(docs, "host", max_per_host=100)
    by = {r["host"]: r["count"] for r in kept.groupBy("host").count().collect()}
    # hot host (4000 docs) down-sampled toward 100 (binomial, 5-sigma)
    assert 50 <= by["hot"] <= 160
    # under-cap hosts pass wholesale (~10-11 docs each)
    tails = {h: c for h, c in by.items() if h != "hot"}
    assert len(tails) == 97 and all(c <= 12 for c in tails.values())
    assert kept.where("host <> 'hot'").count() == 1000
    # deterministic under repartition
    again = cap_per_host(docs.repartition(13), "host", max_per_host=100)
    assert sorted(map(tuple, kept.select("doc_id").collect())) == sorted(
        map(tuple, again.select("doc_id").collect())
    )
    # audit column carries the PRE-cap size
    assert kept.where("host = 'hot'").select("host_count").first()[0] == 4000


def test_with_log2_perplexity(spark):
    import math

    from duplicate_image_detector_spark.operators.lm_filter import (
        with_log2_perplexity,
    )

    scored = spark.createDataFrame(
        [(1, 4, 0, 2_000_000), (2, 4, 4, 0), (3, 0, 0, 0)],
        "doc_id long, n_bigrams long, n_oov long, sum_p_micro long",
    )
    got = {r["doc_id"]: r["log2_ppl"] for r in with_log2_perplexity(scored).collect()}
    # doc 1: mean hit p = 0.5, no OOV -> log2_ppl = 1.0
    assert abs(got[1] - 1.0) < 1e-9
    # doc 2: all OOV at 1e-7 -> -log2(1e-7)
    assert abs(got[2] - (-math.log2(1e-7))) < 1e-9
    # doc 3: no bigrams -> null
    assert got[3] is None


def test_sampler_plan_broadcasts_rates_no_corpus_shuffle(spark):
    docs = _docs_strata(spark, 500)
    rates = spark.createDataFrame([("en", 0.5)], "lang string, fraction double")
    plan = (
        stratified_sample(docs, rates, ["lang"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the docs side reaches the join without an Exchange (scan->filter->join)
    assert plan.count("Exchange") <= 1  # only the broadcast side exchanges
