"""Corpus-level repeated-line removal — the standard webtext cleaning
stage (C4's repeated-span rule, RefinedWeb/Dolma's repeated line and
paragraph removal): lines that recur across many documents are
boilerplate (navigation, cookie banners, footers) carrying no training
signal, and exact-duplicated lines inflate memorization.

No analog in the reference (an image tool) — this operator comes from
the task brief's training-data-pipeline mandate, sitting between the
document-level exact tier and the near tier: it rewrites documents
instead of clustering them.

Two modes over docs(doc_id, text), each at two granularities
(``unit='line'`` | ``'paragraph'`` — paragraphs are runs separated by
>= 2 newlines, the RefinedWeb/Dolma definition):

  * ``df_cap``  — remove EVERY occurrence of a line whose document
    frequency exceeds ``max_df`` (boilerplate strip).  Idempotent: the
    removal deletes whole line-groups, so surviving lines keep their df.
  * ``first``   — of each duplicated line, keep only the globally first
    occurrence (min ``(doc_id, line_no)``), drop the rest (C4-style
    global line dedup).  Also idempotent.

Blank lines (whitespace-only after trim) are never counted and never
removed — they are document structure, not content.  Null text is
treated as empty (M6 corrupt-row tolerance).  Line identity is the
TRIMMED line; the rebuilt text preserves each kept line's original
bytes and order.

Scale shape (the 100-TB question): one narrow explode (no shuffle), one
partial-aggregating groupBy on ``xxhash64(trimmed line)`` (the only
corpus-scale shuffle, ~line-count keyed by 8-byte hashes — never the
raw text), one equi-join of line rows against per-line stats (1:N, a
10^9-occurrence boilerplate line meets exactly ONE stats row, so no
quadratic blowup and no N:M skew; in df_cap mode the stats side is
filtered to the tiny over-cap set first, which AQE broadcasts), and one
groupBy(doc_id) rebuild whose per-group state is bounded by document
size.  The global-first rule deliberately uses groupBy+min+join rather
than a ``row_number`` window: a window partitioned by line key would
funnel each hot key through one task, while the aggregate keeps
map-side partial combining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: unit -> (split regex, rebuild separator).  Paragraph mode implements
#: RefinedWeb/Dolma repeated-PARAGRAPH removal with the same machinery:
#: units are runs separated by >= 2 newlines; the rebuild normalizes
#: separators to exactly one blank line (the standard normalization —
#: original intra-paragraph bytes are preserved, only the inter-
#: paragraph gap width is not).
_UNITS = {"line": ("\n", "\n"), "paragraph": ("\\n{2,}", "\n\n")}


def _line_rows(docs: DataFrame, unit: str = "line") -> DataFrame:
    """(doc_id, line_no, line, norm, key) — one row per unit.  ``norm``
    is the trimmed unit (identity), ``key`` its xxhash64 (join/agg key:
    8 bytes instead of the unit's bytes in every shuffle; a collision
    between distinct units is ~n²/2^65 and would only over-remove)."""
    sep_re, _ = _UNITS[unit]
    lines = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col("text"), F.lit("")), sep_re, -1)
        ).alias("line_no", "line"),
    )
    norm = F.trim(F.col("line"))
    return lines.select(
        "doc_id", "line_no", "line",
        norm.alias("norm"), F.xxhash64(norm).alias("key"),
    )


def line_stats(
    docs: DataFrame, min_df: int = 2, unit: str = "line"
) -> DataFrame:
    """(line, df, n_occurrences) for every distinct non-blank trimmed
    unit appearing in >= ``min_df`` distinct documents — the corpus
    boilerplate profile (what ``df_cap`` removal would strip, plus the
    long tail of template lines below any cap)."""
    return (
        _line_rows(docs, unit)
        .where(F.col("norm") != "")
        .groupBy("key")
        .agg(
            F.min("norm").alias("line"),
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("df") >= F.lit(min_df))
        .drop("key")
    )


def remove_repeated_lines(
    docs: DataFrame,
    max_df: int = 30,
    mode: str = "df_cap",
    unit: str = "line",
) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, text, n_lines, n_removed) with
    repeated units removed per ``mode`` (see module docstring).  Every
    input doc_id survives; a fully-boilerplate document comes back with
    empty text (callers re-apply their min-length validity predicate).
    ``unit='paragraph'`` applies the identical rule at paragraph
    granularity (see ``_UNITS``); idempotent in both units.
    """
    if mode not in ("df_cap", "first"):
        raise ValueError(f"mode must be df_cap|first, got {mode!r}")
    rows = _line_rows(docs, unit)
    nonblank = rows.where(F.col("norm") != "")

    if mode == "df_cap":
        hot = (
            nonblank.groupBy("key")
            .agg(F.countDistinct("doc_id").alias("_df"))
            .where(F.col("_df") > F.lit(max_df))
            .select("key", F.lit(True).alias("_hot"))
        )
        flagged = rows.join(hot, "key", "left").withColumn(
            "_drop", F.coalesce(F.col("_hot"), F.lit(False))
        )
    else:
        firsts = (
            nonblank.groupBy("key")
            .agg(
                F.count("*").alias("_n"),
                F.min(F.struct("doc_id", "line_no")).alias("_first"),
            )
            .where(F.col("_n") >= 2)
            .select("key", "_first")
        )
        flagged = rows.join(firsts, "key", "left").withColumn(
            "_drop",
            F.col("_first").isNotNull()
            & (F.struct("doc_id", "line_no") != F.col("_first")),
        )

    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"),
                            F.struct("line_no", "line"),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            _UNITS[unit][1],
        ).alias("text"),
        F.count("*").alias("n_lines"),
        F.sum(F.col("_drop").cast("int")).alias("n_removed"),
    )
