"""Within-document repetition statistics — the Gopher-rule family
(Rae et al. 2021, "Scaling Language Models", Table A1): documents whose
own lines or n-grams repeat heavily are low-quality (scraper loops,
keyword stuffing, boilerplate listings) and get filtered before
training.  Complements ``linedup`` (ACROSS-document repetition) and
``quality_score_col`` (surface heuristics).

Emitted per document, each an integer-ratio double (bit-exact across
engines, repo float policy):

  * ``dup_line_frac``       — duplicate non-blank lines / non-blank lines
    (occurrences beyond each line's first);
  * ``dup_line_char_frac``  — characters in those duplicate occurrences /
    characters in all non-blank lines (trimmed lengths);
  * ``top_{n}gram_char_frac`` (n in ``top_ns``) — characters covered by
    the single most frequent word n-gram / characters of all n-gram
    occurrences;
  * ``dup_{n}gram_frac`` (n = ``dup_n``) — duplicate n-gram occurrences /
    all n-gram occurrences.

Documents with no qualifying lines/grams score 0.0 (not null, not
dropped) — a 3-word page is short, not repetitive; shortness is the
validity predicate's business.

Scale shape: per-statistic ``explode -> groupBy(doc_id, unit) ->
groupBy(doc_id)`` — every shuffle key CONTAINS doc_id, so corpus-wide
hot units ("click here" as a 2-gram) cannot funnel into one task the
way a unit-keyed window would; all aggregates partial-combine map-side,
and the final assembly is a few doc_id-keyed left joins of one-row-per-
doc tables.  An O(grams²)-per-doc pure-expression form (nested HOF
count-within-array) was rejected: a 1k-word page would pay ~10^6
comparisons per statistic per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.text import (
    grams_col,
    words_col,
)


def _gram_rows(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) — one row per word-n-gram OCCURRENCE (not
    distinct: occurrence counts are the statistic).  grams_col is the
    zip_with kernel — the transform(sequence) form re-evaluates the
    tokenizer per element (see functions/text.py)."""
    return docs.select(
        "doc_id", F.explode(grams_col(words_col(F.col("text")), n)).alias("gram")
    )


def _ratio(num, den) -> F.Column:
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def doc_repetition_stats(
    docs: DataFrame, top_ns: tuple[int, ...] = (2, 3), dup_n: int = 5
) -> DataFrame:
    """docs(doc_id, text) -> one row per doc with the stats above."""
    spine = docs.select("doc_id")

    lines = docs.select(
        "doc_id",
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), "\n", -1)
        ).alias("line"),
    ).select("doc_id", F.trim(F.col("line")).alias("norm"))
    line_agg = (
        lines.where(F.col("norm") != "")
        .groupBy("doc_id", "norm")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            _ratio(
                F.sum(F.col("cnt") - 1), F.sum("cnt")
            ).alias("dup_line_frac"),
            _ratio(
                F.sum((F.col("cnt") - 1) * F.length("norm")),
                F.sum(F.col("cnt") * F.length("norm")),
            ).alias("dup_line_char_frac"),
        )
    )

    out = spine.join(line_agg, "doc_id", "left")
    for n in top_ns:
        top = (
            _gram_rows(docs, n)
            .groupBy("doc_id", "gram")
            .agg(F.count("*").alias("cnt"))
            .groupBy("doc_id")
            .agg(
                _ratio(
                    F.max(F.col("cnt") * F.length("gram")),
                    F.sum(F.col("cnt") * F.length("gram")),
                ).alias(f"top_{n}gram_char_frac")
            )
        )
        out = out.join(top, "doc_id", "left")
    dup = (
        _gram_rows(docs, dup_n)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            _ratio(F.sum(F.col("cnt") - 1), F.sum("cnt")).alias(
                f"dup_{dup_n}gram_frac"
            )
        )
    )
    out = out.join(dup, "doc_id", "left")
    frac_cols = [c for c in out.columns if c != "doc_id"]
    return out.select(
        "doc_id",
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in frac_cols],
    )
