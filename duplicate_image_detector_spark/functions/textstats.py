"""Text-analysis column builders: language ID, quality score, token stats,
document fingerprints.

Training-data-pipeline operators beyond the reference's own inventory
(task brief): every builder is a pure JVM column expression with an exact
DuckDB SQL equivalent (see __spark_entry__.oracle_sql), so each ships with
a hash-exact correctness oracle.  Floats are rounded at a fixed precision
to keep cross-engine IEEE summation differences out of the comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.text import words_col

# tiny seeded stopword lists — deterministic heuristic, not a model
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "a", "that"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
}


def round6_exact(x: Column) -> Column:
    """floor(x*1e6 + 0.5)/1e6 — pure-IEEE rounding, bit-identical across
    engines when ``x`` is (unlike round(), whose half-tie handling differs
    between Spark's BigDecimal HALF_UP and DuckDB's double rounding)."""
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def _hits(words: Column, lang: str) -> Column:
    return F.size(F.filter(words, lambda x: x.isin(*STOPWORDS[lang])))


def lang_id_col(text: Column) -> Column:
    """Deterministic stopword-vote language guess: argmax of per-language
    stopword hit counts, ties broken en > de > fr, zero hits -> 'unknown'."""
    w = words_col(text)
    en, de, fr = _hits(w, "en"), _hits(w, "de"), _hits(w, "fr")
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )


def token_stats_cols(text: Column) -> dict[str, Column]:
    """n_chars, n_tokens, n_distinct_tokens, avg_token_len (rounded 6)."""
    w = words_col(text)
    total_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": F.size(w).cast("long"),
        "n_distinct_tokens": F.size(F.array_distinct(w)).cast("long"),
        "avg_token_len": round6_exact(
            total_len.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")
        ),
    }


def quality_score_col(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.4*min(n_tokens/400,1) + 0.3*distinct_ratio + 0.3*min(avg_len/8,1),
    rounded to 6 digits.  Length/diversity/word-shape — the standard cheap
    pretraining-quality trio."""
    w = words_col(text)
    n = F.greatest(F.size(w), F.lit(1)).cast("double")
    total_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    ).cast("double")
    len_part = F.least(F.size(w).cast("double") / F.lit(400.0), F.lit(1.0))
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n
    shape_part = F.least(total_len / n / F.lit(8.0), F.lit(1.0))
    return round6_exact(
        F.lit(0.4) * len_part + F.lit(0.3) * distinct_ratio + F.lit(0.3) * shape_part
    )


# BPE-style pretokenizer chunks: optional-leading-space letter runs,
# digit runs, and punctuation runs — a lookahead-free subset of the GPT-2
# pattern.  The whitespace class is SPELLED OUT as literal characters:
# Java regex \s includes \x0B (vertical tab) while RE2's does not, so a
# shared \s would silently diverge between Spark and the DuckDB oracle on
# scraped webtext containing vertical tabs.
_WS_CHARS = " \t\n\f\r\x0b"
BPE_TOKEN_REGEX = f" ?[a-z]+| ?[0-9]+| ?[^a-z0-9{_WS_CHARS}]+"


def bpe_token_count_col(text: Column) -> Column:
    """Approximate LLM token count: number of BPE-style pretokenizer
    chunks over the lowercased text.  A cheap, deterministic stand-in for
    a real BPE vocab merge count (the standard sizing heuristic in
    training-data pipelines)."""
    return F.regexp_count(F.lower(text), F.lit(BPE_TOKEN_REGEX)).cast("long")


def fingerprint_cols(text: Column, k: int = 5, n_keep: int = 5) -> dict[str, Column]:
    """Bottom-n_keep md5 fingerprints over k-word shingles (a MinHash-style
    bottom-k sketch with a portable hash): ``min_fp`` is the single minimum
    (a compact doc identity for fuzzy matching), ``bottom_fps`` the
    comma-joined bottom sketch."""
    from duplicate_image_detector_spark.functions.text import shingles_col

    sh = shingles_col(words_col(text), k)
    md5s = F.array_sort(F.transform(sh, lambda s: F.md5(s)))
    # try_element_at: a doc can pass the char-length filter yet have < k
    # tokens (empty shingle array); plain element_at throws under Spark 4
    # ANSI mode before any downstream isNotNull filter can run.
    return {
        "min_fp": F.try_element_at(md5s, F.lit(1)),
        "bottom_fps": F.concat_ws(",", F.slice(md5s, 1, n_keep)),
    }
