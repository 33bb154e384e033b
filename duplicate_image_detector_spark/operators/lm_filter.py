"""Reference-corpus language-model quality scoring — the CCNet recipe:
train a cheap n-gram LM on a trusted reference corpus (CCNet uses a
wiki-trained KenLM) and score crawl documents by how well the model
predicts them; low-likelihood docs are gibberish/boilerplate candidates
and high-likelihood near-1 docs are often templated spam.

Here the LM is a word-bigram MLE model held as a DataFrame — at web
scale the model itself is big data (crawl-wide bigram vocabulary), so
training is one partial-agg ``groupBy`` over the bigram stream and
scoring is an equi-join of the document bigram stream against the model
on ``(w1, w2)``.  Nothing collects to the driver; when the model is
small Spark's AQE broadcasts the join side on its own, and when it is
not, both sides hash-shuffle on the bigram key — the same plan shape at
5e2 or 5e11 documents.

Cross-engine determinism (the gate is value-hashed against DuckDB): all
outputs are int64.  Per-bigram likelihood is kept in micro-probability
space, ``floor(c12 / c1 * 1e6)`` — int64→double conversion is exact
below 2^53 and IEEE division/multiplication are correctly rounded in
both engines, so the floor is bit-determined.  No logarithms cross the
engine boundary: cross-libm ``ln`` ULP differences would make a
hash-compared perplexity flaky, so perplexity is left to the caller as
a monotone transform of the exact aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.text import words_col

MICRO = 1_000_000


def _bigram_rows(docs: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """One row per ADJACENT word pair occurrence (with multiplicity —
    an LM counts occurrences, unlike the distinct shingles the dedup
    tiers use)."""
    # zip_with over two shifted slices, NOT transform(sequence(...)) —
    # the lambda in the transform form re-evaluates the words_col
    # subtree per element (O(n_words x text_len) per doc; measured 100x
    # on 4.6 KB pages).  See grams_col in functions/text.py.
    w = words_col(F.col(text_col))
    n1 = F.greatest(F.size(w) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(w, 1, n1),
        F.slice(w, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select(*id_cols, F.explode(pairs).alias("bg"))
        .select(*id_cols, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def train_bigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    hash_keys: bool = False,
    c1_mode: str = "window",
) -> DataFrame:
    """reference(..., text) -> model(w1, w2, c12, c1), or with
    ``hash_keys=True`` -> model(kb, k1, c12, c1) where ``kb`` =
    xxhash64(w1, w2) and ``k1`` = xxhash64(w1).

    ``hash_keys`` is the web-scale shuffle knob: the training groupBy
    and the scoring join then move 8-byte int64 keys instead of string
    pairs (smaller shuffle, cheaper key compares).  Cost: a ~n²/2^65
    chance of a bigram-count collision (a handful of rows at 10^10
    distinct bigrams — noise for a quality score) and no DuckDB oracle
    (xxhash64 is Spark-specific), which is why the gate runs the string
    path; equivalence on collision-free fixtures is pytest-pinned.

    ``c12`` = corpus count of the bigram, ``c1`` = count of ``w1`` as a
    bigram left-word (so MLE p(w2|w1) = c12/c1 sums to 1 per w1).

    ``c1_mode`` selects how ``c1`` is derived from the aggregated model
    rows (outputs identical, pytest-pinned):

    * ``"window"`` (default): a window sum partitioned by the left word
      — one shuffle of the raw bigram stream (the partial-agg groupBy)
      plus a MODEL-sized repartition.  The naive
      ``c12.join(c12.groupBy(...))`` would instead evaluate the c12
      subtree TWICE (Catalyst does not dedupe common subplans), i.e.
      two full shuffles of the raw bigram stream.  Bound: every model
      row of one left word passes through a single window task, so the
      hottest word's distinct-bigram fan-out must fit a task (~10^8
      rows — comfortably true even for "the" at crawl scale, but it IS
      a per-key ceiling).
    * ``"two_phase"``: the aggregated c12 rows are PERSISTED (breaking
      the double-evaluation trap at the cost of caching one model
      copy), then ``c1`` is a separate model-sized groupBy joined back.
      No single-task fan-in bound — the crossover is a vocabulary whose
      hottest left word exceeds task memory in model rows.  The caller
      may unpersist the returned plan's cache after materializing.
    """
    from pyspark.storagelevel import StorageLevel

    if c1_mode not in ("window", "two_phase"):
        raise ValueError(f"c1_mode must be 'window' or 'two_phase': {c1_mode!r}")
    bg = _bigram_rows(reference.where(F.col(text_col).isNotNull()), [], text_col)
    pair_cols, w1_col = (
        (["kb", "k1"], "k1") if hash_keys else (["w1", "w2"], "w1")
    )
    if hash_keys:
        bg = bg.select(
            F.xxhash64("w1", "w2").alias("kb"), F.xxhash64("w1").alias("k1")
        )
    c12 = bg.groupBy(*pair_cols).agg(F.count(F.lit(1)).alias("c12"))
    if c1_mode == "two_phase":
        c12 = c12.persist(StorageLevel.MEMORY_AND_DISK)
        c12.count()
        c1 = c12.groupBy(w1_col).agg(F.sum("c12").alias("c1"))
        return c12.join(c1, w1_col).select(*pair_cols, "c12", "c1")
    w = Window.partitionBy(w1_col)
    return c12.select(*pair_cols, "c12", F.sum("c12").over(w).alias("c1"))


def p_micro_col(c12: Column, c1: Column) -> Column:
    """floor(c12/c1 * 1e6) as int64 — exact for counts < 2^53."""
    return F.floor(
        c12.cast("double") / c1.cast("double") * F.lit(float(MICRO))
    ).cast("long")


def score_bigram_lm(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs(id, text) x model -> (id, n_bigrams, n_oov, sum_p_micro).

    ``n_oov`` counts document bigrams absent from the model (score 0 —
    an unsmoothed MLE; smoothing constants cancel in ranking and would
    drag floats across the engine boundary).  ``sum_p_micro`` is the
    exact int64 sum of per-bigram micro-probabilities; callers derive
    ``mean p = sum_p_micro / n_bigrams / 1e6`` or any monotone filter
    threshold from it.  Docs with < 2 words score (0, 0, 0) — reported,
    not dropped, per the M6 corrupt-row contract.
    """
    bg = _bigram_rows(
        docs.where(F.col(text_col).isNotNull()), [id_col], text_col
    )
    if "kb" in model.columns:  # hash-keyed model (train hash_keys=True)
        bg = bg.select(id_col, F.xxhash64("w1", "w2").alias("kb"))
        join_keys = ["kb"]
    else:
        join_keys = ["w1", "w2"]
    scored = bg.join(model, join_keys, "left").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("c12").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.sum(
            F.when(F.col("c12").isNull(), F.lit(0).cast("long")).otherwise(
                p_micro_col(F.col("c12"), F.col("c1"))
            )
        ).alias("sum_p_micro"),
    )
    ids = docs.select(id_col).distinct()
    return (
        ids.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.coalesce("sum_p_micro", F.lit(0)).alias("sum_p_micro"),
        )
    )


def with_log2_perplexity(scored: DataFrame, oov_p: float = 1e-7) -> DataFrame:
    """Add the conventional ``log2_ppl`` view of a score row (mean
    negative log2 transition probability; OOV bigrams at ``oov_p``).

    Engine-side convenience only — derived from the exact aggregates
    via a MONOTONE-ish approximation (log of the mean, not mean of
    logs, because per-bigram probabilities are already folded into
    ``sum_p_micro``); thresholding/filtering semantics match CCNet
    usage.  Deliberately NOT part of any hash gate: cross-libm log ULP
    differences make float hashes flaky (see module docstring).
    """
    n = F.col("n_bigrams")
    hits = n - F.col("n_oov")
    mean_hit_p = F.when(
        hits > 0,
        F.col("sum_p_micro").cast("double") / (hits.cast("double") * 1e6),
    ).otherwise(F.lit(None))
    # blend hit mass and OOV mass in probability space, then one log
    blended = F.when(
        n > 0,
        (
            F.coalesce(mean_hit_p, F.lit(0.0)) * hits.cast("double")
            + F.lit(oov_p) * F.col("n_oov").cast("double")
        )
        / n.cast("double"),
    )
    return scored.withColumn(
        "log2_ppl", F.when(n > 0, -F.log2(F.greatest(blended, F.lit(1e-12))))
    )
