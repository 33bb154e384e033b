"""MinHash / SimHash column expressions — all JVM-side, no Python hot path.

This replaces the reference's dense-embedding feature stage
(/root/reference/duplicate-detector.py:1024-1098, SSCD 1024-d float vectors)
with set signatures:

  * ``minhash_col``  — n_perm universal-hash minima over shingle hashes,
    each permutation an ``array_min(transform(...))`` expression: per-row,
    shuffle-free, whole-stage-codegen'd.
  * ``simhash_col``  — bit-majority fingerprint over shingle hashes.

Two base shingle-hash variants:
  * ``shingle_xxhash64_col`` — Spark's built-in xxhash64; the fast at-scale
    default.
  * ``shingle_md5_60bit_col`` — first 15 hex digits of md5 parsed to BIGINT.
    md5 exists identically in DuckDB (``('0x' || substr(md5(s),1,15))::BIGINT``),
    so correctness-gate queries built on this hash are oracle-reproducible
    bit-for-bit.  60 bits keeps the value non-negative in both engines.

Determinism: permutation params come from the seeded config
(PipelineConfig.perm_params), independent of partitioning — the distributed
replacement for the reference's sorted-scan determinism (ref :2666).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from duplicate_image_detector_spark.config import PipelineConfig

_U32 = 4294967295  # 0xFFFFFFFF


def shingle_xxhash64_col(shingles: Column) -> Column:
    """array<string> -> array<bigint> via built-in xxhash64 (seed 42)."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def shingle_md5_60bit_col(shingles: Column) -> Column:
    """array<string> -> array<bigint>: int(md5(s)[:15 hex], 16).

    Non-negative 60-bit values; reproducible in DuckDB SQL for the oracle.
    """
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )


def minhash_col(hashes: Column, cfg: PipelineConfig) -> Column:
    """array<bigint> shingle hashes -> array<int> MinHash signature.

    h_i(x) = (a_i * (x & 0xFFFFFFFF) + b_i) mod p, minimum per permutation.
    The 32-bit truncation + a_i < 2^30 bounds the product under 2^62 so the
    arithmetic is exact int64 under ANSI mode.

    Expressed as ONE ``transform`` over a literal (a,b) parameter array —
    codegen emits a loop instead of 128 unrolled aggregate expressions,
    which cuts the first-query compile cost ~5x (measured) with identical
    results.
    """
    p = F.lit(cfg.hash_prime)
    params = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in cfg.perm_params()
        ]
    )
    return F.transform(
        params,
        lambda prm: F.array_min(
            F.transform(
                hashes,
                lambda h: (
                    h.bitwiseAND(F.lit(_U32)) * prm["a"] + prm["b"]
                ) % p,
            )
        ).cast("int"),
    )


def simhash_col(hashes_col_sql: str, cfg: PipelineConfig) -> Column:
    """shingle-hash array column (referenced BY NAME / SQL fragment)
    -> bigint SimHash fingerprint.

    Bit j of the output is 1 iff the majority of (distinct) shingle hashes
    have bit j set (strict majority; ties -> 0).  ``cfg.simhash_bits`` <= 62
    keeps the result non-negative.

    Written as a SQL expression because the bit weight ``shiftleft(1L, j)``
    needs the lambda variable ``j`` as the shift amount, which the Python
    ``F.shiftleft`` builder (int-only literal) cannot express.  Like
    minhash_col, the loop form keeps generated code small (no 60 unrolled
    aggregates).
    """
    b = cfg.simhash_bits
    return F.expr(
        f"""
        aggregate(
          transform(sequence(0, {b - 1}), j ->
            IF(aggregate({hashes_col_sql}, 0,
                         (acc, h) -> acc + IF((h & shiftleft(1L, j)) != 0, 1, -1)) > 0,
               shiftleft(1L, j), 0L)),
          0L, (acc, x) -> acc + x)
        """
    )


def hamming_col(a: Column, b: Column) -> Column:
    """Hamming distance between two bigint fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def band_structs_col(minhash: Column, cfg: PipelineConfig) -> Column:
    """array<struct<band_id int, band_hash bigint>> — LSH banding.

    Each band hashes ``rows_per_band`` consecutive signature values with
    xxhash64 (structural hash over the sliced array).  ``band_id`` is a
    separate join key, so identical row-slices in different bands never
    collide.

    Deliberately UNROLLED (16 plain expressions) rather than a
    ``transform`` lambda: higher-order functions are interpreted —
    excluded from whole-stage codegen — and this expression runs once per
    document on the hottest path (band explode feeds the LSH shuffle).
    Measured at 500k docs / local[32]: 2.8s interpreted vs 0.5s unrolled
    for the full explode, bit-identical output.  (The 128-element MinHash
    fold stays loop-form for compile-time reasons; its production path is
    the NumPy kernel anyway — operators/signatures.py.)
    """
    r = cfg.rows_per_band
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("band_id"),
                F.xxhash64(F.slice(minhash, i * r + 1, r)).alias("band_hash"),
            )
            for i in range(cfg.bands)
        ]
    )


# ---------------------------------------------------------------------------
# Pure-Python mirrors (test oracle)
# ---------------------------------------------------------------------------

def py_md5_60bit(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_simhash(hashes: list[int], bits: int) -> int:
    out = 0
    for j in range(bits):
        s = sum(1 if (h >> j) & 1 else -1 for h in hashes)
        if s > 0:
            out |= 1 << j
    return out


def plan_lsh(
    threshold: float,
    n_perm: int = 128,
    *,
    weight_fn: float = 1.0,
    weight_fp: float = 1.0,
    grid: int = 2000,
) -> dict:
    """Choose the (bands, rows_per_band) split of ``n_perm`` MinHash
    permutations for a Jaccard ``threshold`` — the S-curve tuning the
    reference does by hand-picked constants (duplicate-detector.py:398-400
    fixes its thresholds; here the banding is derived, not guessed).

    The probability two docs at similarity ``s`` become LSH candidates
    is ``p(s) = 1 − (1 − s^r)^b``.  The planner scans every split with
    ``b·r ≤ n_perm`` (preferring exact products) and minimizes the
    integrated step-function mismatch::

        err(b, r) = w_fp · ∫₀^t p(s) ds  +  w_fn · ∫ₜ¹ (1 − p(s)) ds

    ``weight_fn > weight_fp`` biases toward recall (candidates are
    cheap to verify, misses are forever — the usual dedup preference);
    the integral is a plain midpoint sum (exact enough at ``grid``
    points; the argmin is stable well below 2000).

    Pure driver-side math — runs once per job config, never per row.
    Returns bands / rows_per_band / expected_error plus diagnostics:
    ``s50`` (the curve's 50% crossing ``(1 − 2^(−1/b))^(1/r)``) and the
    candidate-admission probabilities at ``threshold`` and at
    ``0.5·threshold`` (the junk-pair rate driver).
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if n_perm < 2:
        raise ValueError(f"n_perm must be >= 2, got {n_perm}")
    best = None
    for r in range(1, n_perm + 1):
        b = n_perm // r
        if b < 1:
            break
        err = 0.0
        for i in range(grid):
            s = (i + 0.5) / grid
            p = 1.0 - (1.0 - s**r) ** b
            err += weight_fp * p if s < threshold else weight_fn * (1.0 - p)
        err /= grid
        # among equal-error splits prefer the one using every permutation
        key = (err, -(b * r), r)
        if best is None or key < best[0]:
            best = (key, b, r)
    _, b, r = best

    def p_at(s: float) -> float:
        return 1.0 - (1.0 - s**r) ** b

    return {
        "bands": b,
        "rows_per_band": r,
        "n_perm_used": b * r,
        "expected_error": best[0][0],
        "s50": (1.0 - 0.5 ** (1.0 / b)) ** (1.0 / r),
        "p_at_threshold": p_at(threshold),
        "p_at_half_threshold": p_at(threshold / 2.0),
    }
