"""Pinned pipeline configuration.

Mirrors the reference's ``Config`` dataclass discipline
(/root/reference/duplicate-detector.py:380-451): one frozen dataclass whose
semantics-affecting fields hash to a cache key (`get_cache_key`, ref :439-451)
that gates reuse of per-stage checkpoints.  Changing any field invalidates
resume, exactly the reference's contract.

Defaults are the SURVEY.md §7.0 pinned config.  ``jaccard_threshold=0.86`` is
deliberately the reference's ``sscd_threshold`` (ref :391).
"""

from __future__ import annotations

import hashlib
import json
import random
from dataclasses import asdict, dataclass, replace


@dataclass(frozen=True)
class PipelineConfig:
    # --- shingling / normalization ---
    shingle_k: int = 5            # words per shingle
    min_text_len: int = 50        # chars; shorter docs are filtered (M2 analog)
    # --- MinHash / LSH ---
    n_perm: int = 128             # MinHash permutations
    bands: int = 16               # LSH bands (b)
    rows_per_band: int = 8        # rows per band (r); b*r must == n_perm
    jaccard_threshold: float = 0.86   # verify threshold (ref sscd_threshold :391)
    max_bucket: int = 2000        # LSH bucket cap; larger buckets use pivot pairing
    ngram_df_cap: int = 2000      # drop shingles with document frequency > cap
    #   from the exact-Jaccard universe (a df-B shingle contributes B(B-1)/2
    #   join rows; >2000-doc shingles are boilerplate with no dedup signal).
    #   Pass df_cap=None to the operator for uncapped plain-exact semantics.
    # --- SimHash ---
    simhash_bits: int = 60        # 15 hex digits of md5 -> non-negative BIGINT
    simhash_hamming_max: int = 3  # near-exact if Hamming distance <= this
    simhash_n_chunks: int | None = None  # pigeonhole layout pin; None lets
    #   in-job generators pick by corpus size (pick_simhash_layout) and
    #   everything else (notably the materialized chunk index and its
    #   delta-side mate, which MUST agree) use the minimal d+1 layout
    simhash_wide_docs: int = 5_000_000   # docs; above this, size-aware
    #   callers switch to the Manku combination layout (simhash.py;
    #   crossover measured by BENCH/simhash_layout_ab_2000k.json)
    # --- substring tier ---
    substring_min_len: int = 400  # min shared span length L (chars)
    substring_gram: int = 64      # rolling-hash gram size k
    substring_mod: int = 32       # content-defined sampling density (keep ~1/mod)
    # --- identity ---
    id_bits: int = 64             # doc_id width: 64 = xxhash64(url) BIGINT;
    #   128 = struct(xxhash64(url), xxhash64(reverse(url))) — expected
    #   collisions drop from ~27 at 10^12 docs (n^2/2^65) to ~0 (n^2/2^129);
    #   every pair/CC/cluster stage is id-type-agnostic, so the plan shape
    #   is identical, only the key width changes
    # --- determinism ---
    seed: int = 42
    hash_prime: int = 2147483647  # 2^31 - 1 (Mersenne); (a*h32+b) % p fits int64

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.n_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}*{self.rows_per_band}) "
                f"must equal n_perm ({self.n_perm})"
            )
        if self.substring_gram >= self.substring_min_len:
            raise ValueError("substring_gram must be < substring_min_len")
        if self.id_bits not in (64, 128):
            raise ValueError(f"id_bits must be 64 or 128, got {self.id_bits}")
        if (
            self.simhash_n_chunks is not None
            and self.simhash_n_chunks <= self.simhash_hamming_max
        ):
            raise ValueError(
                f"simhash_n_chunks ({self.simhash_n_chunks}) must exceed "
                f"simhash_hamming_max ({self.simhash_hamming_max})"
            )

    def config_hash(self) -> str:
        """Stable 16-hex-char key over all semantics-affecting fields.

        Analog of the reference's md5(config)[:16] cache key (ref :439-451).
        """
        blob = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def perm_params(self) -> list[tuple[int, int]]:
        """Seeded (a, b) pairs for the universal-hash MinHash permutations.

        h_i(x) = (a_i * (x & 0xFFFFFFFF) + b_i) mod p  with a_i < 2^30,
        b_i < 2^30, p = 2^31-1, so the product stays < 2^62 (no int64
        overflow under Spark ANSI mode).  Seeding makes signatures
        reproducible across partitionings and cluster sizes — the
        distributed replacement for the reference's sorted-scan determinism
        (ref :2666).
        """
        rng = random.Random(self.seed)
        return [
            (rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30))
            for _ in range(self.n_perm)
        ]

    def with_recall_banding(self) -> "PipelineConfig":
        """Same 128 permutations re-banded 32x4 for near-exact recall.

        S-curve: candidate-miss probability at j=0.86 drops from
        (1-0.86^8)^16 ≈ 3.4e-3 (16x8) to (1-0.86^4)^32 ≈ 1e-11 (32x4).
        Used by the correctness gate where the output must match an exact
        all-pairs oracle; the 16x8 banding remains the at-scale default.
        """
        return replace(self, bands=32, rows_per_band=4)


DEFAULT_CONFIG = PipelineConfig()
