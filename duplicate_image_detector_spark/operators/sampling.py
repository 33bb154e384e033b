"""Deterministic stratified sampling — the data-mixing step of an LLM
pipeline: down/up-weight strata (language, source, quality bucket) to a
target mixture by KEEPING a per-stratum fraction of documents.

Two properties a training-data sampler needs that ``df.sample`` lacks:

* **Determinism**: membership is a pure function of the document id, so
  re-running the pipeline (or resuming half of it) selects the same
  rows — no RNG state, no partition-order dependence.
* **Stratification**: each stratum gets its own keep-fraction, joined
  in as a (broadcast) rates table rather than a giant CASE, so mixtures
  are data, not code.

Membership: ``sample_hash(id) % 1e6 < floor(fraction * 1e6)`` — a
sub-ppm-resolution coin that is integer-exact, so the SQL oracle can
replay it byte-for-byte.  The hash is a two-limb multiplicative mix
(below) chosen over ``xxhash64`` deliberately: it is expressible in
ANSI SQL in any engine, and it stays inside int64 under ANSI overflow
checking for any ``|id| < 2^53`` (where the limb split's double
division is exact — comfortably past any crawl's doc count, and
sign-safe via pmod for hash-derived ids).  The plan is scan →
broadcast-join → filter, zero shuffles of the corpus at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_A = 2_654_435_761          # Knuth multiplicative constant (2^32 / phi)
_B = 40_503                 # 16-bit Fibonacci-hash constant
_LIMB = 1_000_003           # prime limb split keeps products < 2^62
MICRO = 1_000_000


def sample_hash_col(id_col: Column) -> Column:
    """int64 in [0, 2^32): mixes both limbs of the id so neither low
    nor high bits of sequential ids bias the coin.

    pmod (not ``%``) everywhere: Spark's ``%`` keeps the dividend's
    sign, so a negative id would yield a negative hash whose
    ``% 1e6`` coin is ALWAYS below any keep threshold — every
    negative-id row silently kept.  With pmod the hash is well-defined
    for any ``|id| < 2^53`` (the limb split rides through an exact
    double division)."""
    lo = F.pmod(id_col, F.lit(_LIMB))
    hi = (id_col - lo) / F.lit(_LIMB)  # exact: multiple of _LIMB / _LIMB
    return F.pmod(
        lo * F.lit(_A) + hi.cast("long") * F.lit(_B) + F.lit(7),
        F.lit(4_294_967_296),
    ).cast("long")


def cap_per_host(
    docs: DataFrame,
    host_col: str,
    max_per_host: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-diversity capping — down-sample hosts that dominate the
    crawl so no single domain floods the training mix (the FineWeb /
    Gopher "domain diversity" stage).

    Scale-honest design: the EXACT top-N-per-host alternative is a
    window sort whose worst partition is the hottest host (10^9 rows on
    one reducer for a link farm).  Instead: one partial-agg count per
    host, then rows of an over-cap host pass a deterministic hash coin
    with fraction ``max_per_host / host_count`` — expected kept ≈ cap
    with binomial noise, membership a pure function of (id, counts), so
    the result is reproducible and SQL-replayable exactly.  Under-cap
    hosts pass wholesale without any per-row coin.  Adds ``host_count``
    (pre-cap) for audit.

    Coin resolution: the threshold uses the FULL 2^32 hash range
    (``h < floor(cap * 2^32 / host_count)``), so the smallest
    representable keep-fraction is 2^-32 ≈ 2.3e-10, and the threshold
    is clamped to >= 1 so a host hotter than ``cap * 2^32`` rows keeps
    rows at that minimum fraction instead of being silently dropped to
    ZERO (the failure mode of a 1e-6-resolution coin at
    ``host_count > cap * 1e6``).  ``cap * 2^32`` and the division stay
    exact in doubles for any ``max_per_host < 2^21`` (product < 2^53),
    which keeps the floor bit-identical in DuckDB."""
    counts = docs.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("host_count")
    )
    h = sample_hash_col(F.col(id_col))
    return (
        docs.join(counts, host_col)
        .where(
            (F.col("host_count") <= max_per_host)
            | (h < _host_keep_threshold(max_per_host, F.col("host_count")))
        )
    )


def _host_keep_threshold(max_per_host: int, host_count: Column) -> Column:
    """2^32-range keep threshold, clamped to >= 1 (see cap_per_host)."""
    return F.greatest(
        F.floor(
            F.lit(float(max_per_host) * 4_294_967_296.0)
            / host_count.cast("double")
        ).cast("long"),
        F.lit(1).cast("long"),
    )


def stratified_sample(
    docs: DataFrame,
    rates: DataFrame,
    strata_cols: list[str],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """docs x rates(strata..., fraction) -> the kept rows, plus the
    ``sample_hash`` column for audit.  Strata absent from ``rates``
    keep ``default_fraction``.  ``rates`` is an eval-suite-sized table
    (one row per stratum) and is explicitly broadcast."""
    r = rates.select(
        *strata_cols,
        F.floor(F.col("fraction") * MICRO).cast("long").alias("_keep_micro"),
    )
    h = sample_hash_col(F.col(id_col))
    return (
        docs.join(F.broadcast(r), strata_cols, "left")
        .withColumn(
            "_keep_micro",
            F.coalesce(
                "_keep_micro",
                F.lit(int(default_fraction * MICRO)).cast("long"),
            ),
        )
        .where((h % MICRO) < F.col("_keep_micro"))
        .drop("_keep_micro")
        .withColumn("sample_hash", h)
    )
