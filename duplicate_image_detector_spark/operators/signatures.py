"""Signature stage: shingle hashes + MinHash + SimHash per document.

Analog of the reference's feature-extraction stage
(/root/reference/duplicate-detector.py:1024-1098): where the reference runs a
TorchScript model over image batches to get 1024-d vectors, we compute set
signatures over k-word shingles.

Two implementations with IDENTICAL output (parity-tested):

  * ``method='pandas'`` (default) — NumPy-vectorized ``mapInPandas``: the
    128-permutation MinHash is one (128, n_shingles) int64 matrix op per
    doc, SimHash one bit-unpack + majority per doc.  This is the analog of
    the reference's batched NumPy/model forward (ref :1024-1098, blocked
    matmul :1404-1415) and is the at-scale hot path: Spark does NOT codegen
    higher-order-function lambdas, so the expression variant pays ~100ns of
    interpreted eval per array element (measured: the HOF plan is >50x
    slower on the 50k-doc bench corpus).
  * ``method='sql'`` — pure column expressions; useful for streaming
    (shared with streaming/incremental.py) and as a cross-check.

The base shingle hash is md5-60bit (first 15 hex digits): portable across
Python / Spark SQL / DuckDB, which is what lets both methods agree exactly
and the DuckDB correctness oracle reproduce signatures bit-for-bit.

Output schema (one row per doc that survives the min-length filter):
    doc_id BIGINT, text_sha256 STRING, n_tokens INT, n_shingles INT,
    shingle_hashes ARRAY<BIGINT> (distinct, sorted), minhash ARRAY<INT>,
    simhash BIGINT

``shingle_hashes`` is kept because the verify stage (exact Jaccard) needs
the sets — the analog of the reference keeping the feature matrix resident
for verification.  The heavy ``text`` column is projected away here so no
downstream shuffle carries it (SURVEY §4 column-pruning note).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.functions.hashing import (
    minhash_col,
    shingle_md5_60bit_col,
    simhash_col,
)
from duplicate_image_detector_spark.functions.text import (
    py_shingles,
    py_tokenize,
    shingles_col,
    text_sha256_col,
    words_col,
)

if TYPE_CHECKING:
    import pandas as pd

# {id} is the doc_id DDL — 'bigint' (id_bits=64) or the 128-bit struct;
# the kernels pass the id column through untouched, so the schema follows
# the input
SIGNATURE_SCHEMA_FULL = (
    "doc_id {id}, text_sha256 string, n_tokens int, n_shingles int, "
    "shingle_hashes array<bigint>, minhash array<int>, simhash bigint"
)
SIGNATURE_SCHEMA_SLIM = (
    "doc_id {id}, text_sha256 string, n_tokens int, n_shingles int, "
    "minhash array<int>, simhash bigint"
)
SHINGLE_SETS_SCHEMA = "doc_id {id}, shingle_hashes array<bigint>"


def _id_ddl(df: DataFrame, col: str = "doc_id") -> str:
    return df.schema[col].dataType.simpleString()

_U32 = np.int64(0xFFFFFFFF)
_POLY_B = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio base, mod-2^64 wrap
_MEMO_CAP = 2_000_000  # token-memo entries per worker (bounds memory)


def _word_hash(w: str) -> int:
    """The ONE home of the token-hash derivation (md5, top 8 bytes) —
    shared by the per-doc and batch paths so they can never diverge."""
    return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")


class _ShingleHasher:
    """Per-worker shingle hasher with a memoized token-hash table.

    ``kind='md5'``  — md5-60bit of the shingle *string* (portable to Spark
    SQL / DuckDB; the oracle-parity hash; one md5 per shingle).
    ``kind='poly'`` — uint64-wrapping polynomial over md5-60bit *token*
    hashes (one md5 per DISTINCT TOKEN, memoized across the worker's
    lifetime, then k fused numpy ops per doc).  ~10x fewer md5 calls and
    no per-shingle string building; the at-scale default.  Hash identity
    differs from 'md5' but every downstream value (Jaccard = set-count
    ratio, candidates, clusters) is hash-choice-invariant.
    """

    def __init__(self, kind: str, k: int):
        self.kind = kind
        self.k = k
        self._tok: dict[str, int] = {}

    def _token_hashes(self, words: list[str]) -> np.ndarray:
        tok = self._tok
        if len(tok) > _MEMO_CAP:  # bound worker memory on huge vocabularies
            tok.clear()
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = tok.get(w)
            if h is None:
                h = _word_hash(w)
                tok[w] = h
            out[i] = h
        return out

    def batch_token_hashes(
        self, words_lists: list[list[str]]
    ) -> list[np.ndarray]:
        """Token-hash arrays for a whole batch of docs at once.

        Same values as per-doc ``_token_hashes``, but the memo-dict lookup
        runs once per DISTINCT word in the batch (``pd.factorize``, a C
        hash table) instead of once per word occurrence — profiling showed
        the per-occurrence dict gets (11.5M per 20k docs) costing ~25% of
        the whole signature kernel.
        """
        import pandas as pd

        tok = self._tok
        if len(tok) > _MEMO_CAP:
            tok.clear()
        flat = [w for ws in words_lists for w in ws]
        if not flat:
            return [np.empty(0, dtype=np.uint64) for _ in words_lists]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        uh = np.empty(len(uniques), dtype=np.uint64)
        for j, w in enumerate(uniques):
            h = tok.get(w)
            if h is None:
                h = _word_hash(w)
                tok[w] = h
            uh[j] = h
        th_flat = uh[codes]
        out: list[np.ndarray] = []
        pos = 0
        for ws in words_lists:
            out.append(th_flat[pos : pos + len(ws)])
            pos += len(ws)
        return out

    def poly_doc_hashes(self, th: np.ndarray) -> np.ndarray | None:
        """distinct sorted int64 shingle hashes from one doc's token-hash
        array (the 'poly' fold of ``doc_hashes``, split out for the
        batch path)."""
        k = self.k
        if len(th) < k:
            return None
        m = len(th) - k + 1
        h = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            h = h * _POLY_B + th[j : j + m]  # wraps mod 2^64 (intended)
        return np.unique(h.view(np.int64))

    def doc_hashes(self, words: list[str]) -> np.ndarray | None:
        """distinct sorted int64 shingle hashes for one doc, or None."""
        k = self.k
        if len(words) < k:
            return None
        if self.kind == "md5":
            shingles = py_shingles(words, k)
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                    >> 4
                    for s in shingles
                ),
                dtype=np.int64,
                count=len(shingles),
            )
            return np.unique(hs)
        return self.poly_doc_hashes(self._token_hashes(words))


def _list_array(flat: np.ndarray, lengths: list[int], pa_type):
    """Arrow list array from a flat value buffer + per-row lengths —
    no per-element Python objects."""
    import pyarrow as pa

    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(flat, type=pa_type)
    )


def _signatures_gen(cfg: PipelineConfig, include_shingles: bool, hash_kind: str):
    """mapInArrow generator: (doc_id, text) batches -> signature rows.

    Emits Arrow record batches built from flat NumPy buffers (ListArray
    offsets), never per-element Python lists: at 32 concurrent workers the
    PyObject churn of ``.tolist()`` rows dominated memory bandwidth and
    collapsed multi-core scaling.

    id-type-agnostic: kept rows are tracked by INDEX and the doc_id column
    is passed through with Arrow ``take`` — the same kernel serves the
    64-bit BIGINT key and the 128-bit struct key (cfg.id_bits).
    """
    import pyarrow as pa

    k = cfg.shingle_k
    min_len = cfg.min_text_len
    perms = np.asarray(cfg.perm_params(), dtype=np.int64)  # (n_perm, 2)
    a_col = perms[:, 0:1]
    b_col = perms[:, 1:2]
    prime = np.int64(cfg.hash_prime)
    bit_idx = np.arange(cfg.simhash_bits, dtype=np.int64)
    bit_w = (np.int64(1) << bit_idx)

    names = ["doc_id", "text_sha256", "n_tokens", "n_shingles"]
    if include_shingles:
        names.append("shingle_hashes")
    names += ["minhash", "simhash"]

    n_bits = len(bit_idx)

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        hasher = _ShingleHasher(hash_kind, k)
        for batch in batches:
            texts = batch.column("text").to_pylist()
            # pass 1: tokenize survivors, then hash tokens for the WHOLE
            # batch at once ('poly': one factorize + one memo probe per
            # distinct word — see batch_token_hashes)
            idxs: list[int] = []
            words_lists: list[list[str]] = []
            for i, text in enumerate(texts):
                if text is None or len(text) < min_len:
                    continue
                idxs.append(i)
                words_lists.append(py_tokenize(text))
            if hash_kind == "poly":
                th_list = hasher.batch_token_hashes(words_lists)
                hs_list = [hasher.poly_doc_hashes(th) for th in th_list]
            else:
                hs_list = [hasher.doc_hashes(ws) for ws in words_lists]

            kept: list[int] = []
            shas, ntok, nsh, sh64 = [], [], [], []
            hs_chunks: list[np.ndarray] = []
            mh_rows: list[np.ndarray] = []
            for i, words, hs in zip(idxs, words_lists, hs_list):
                if hs is None or len(hs) == 0:
                    continue
                h32 = hs & _U32
                # (n_perm, n_shingles) permutation-hash matrix, built with
                # in-place ufuncs (one temporary instead of three; the
                # matrix is the kernel's largest allocation)
                ph = np.multiply(a_col, h32[None, :])
                np.add(ph, b_col, out=ph)
                np.remainder(ph, prime, out=ph)
                mh = ph.min(axis=1)
                # SimHash bit counts via unpackbits on the raw (little-
                # endian) bytes: identical bits 0..59, but a (n, 64) uint8
                # matrix instead of (n, 60) int64 — 8x less memory traffic
                byt = hs.astype("<i8", copy=False).view(np.uint8).reshape(-1, 8)
                counts = np.unpackbits(byt, axis=1, bitorder="little").sum(
                    axis=0, dtype=np.int64
                )[:n_bits]
                sums = 2 * counts - len(hs)
                kept.append(i)
                shas.append(hashlib.sha256(texts[i].encode()).hexdigest())
                ntok.append(len(words))
                nsh.append(len(hs))
                if include_shingles:
                    hs_chunks.append(hs)
                mh_rows.append(mh.astype(np.int32))
                sh64.append(int(bit_w[sums > 0].sum()))
            n = len(kept)
            cols = [
                batch.column("doc_id").take(pa.array(kept, type=pa.int32())),
                pa.array(shas, type=pa.string()),
                pa.array(np.asarray(ntok, dtype=np.int32)),
                pa.array(np.asarray(nsh, dtype=np.int32)),
            ]
            if include_shingles:
                flat = (
                    np.concatenate(hs_chunks)
                    if hs_chunks
                    else np.empty(0, dtype=np.int64)
                )
                cols.append(_list_array(flat, nsh, pa.int64()))
            mh_flat = (
                np.concatenate(mh_rows)
                if mh_rows
                else np.empty(0, dtype=np.int32)
            )
            cols.append(_list_array(mh_flat, [len(perms)] * n, pa.int32()))
            cols.append(pa.array(np.asarray(sh64, dtype=np.int64)))
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return gen


def shingle_sets_for(
    docs: DataFrame,
    doc_ids: DataFrame,
    cfg: PipelineConfig,
    hash_kind: str = "poly",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shingle_hashes) for the given doc ids only.

    The verify stage calls this with the candidate-doc set, so full shingle
    arrays exist only for the (small) fraction of the corpus that actually
    reached a candidate pair — the distributed analog of the reference
    re-reading image pixels inside its verification workers
    (/root/reference/duplicate-detector.py:1251-1252) instead of keeping
    them resident.
    """
    import pyarrow as pa

    k = cfg.shingle_k

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        hasher = _ShingleHasher(hash_kind, k)
        for batch in batches:
            texts = batch.column("text").to_pylist()
            kept: list[int] = []
            lens: list[int] = []
            chunks: list[np.ndarray] = []
            for i, text in enumerate(texts):
                if text is None:
                    continue
                hs = hasher.doc_hashes(py_tokenize(text))
                if hs is None or len(hs) == 0:
                    continue
                kept.append(i)
                lens.append(len(hs))
                chunks.append(hs)
            flat = (
                np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").take(pa.array(kept, type=pa.int32())),
                    _list_array(flat, lens, pa.int64()),
                ],
                names=["doc_id", "shingle_hashes"],
            )

    # candidate-id set is orders of magnitude smaller than the corpus:
    # broadcast it so the semi-join never shuffles the text column.  (At a
    # scale where the candidate set itself is huge, drop the hint and let
    # AQE pick a sort-merge semi-join.)
    from duplicate_image_detector_spark.partitioning import (
        ensure_min_parallelism,
    )

    ids = F.broadcast(doc_ids.select("doc_id").distinct())
    src = ensure_min_parallelism(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).join(ids, "doc_id", "left_semi"),
        # md5 is the compute-dense kernel (see compute_signatures)
        **({"target_bytes": 16 << 10} if hash_kind == "md5" else {}),
    )
    return src.mapInArrow(gen, schema=SHINGLE_SETS_SCHEMA.format(id=_id_ddl(src)))


def compute_signatures(
    docs: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "pandas",
    keep_shingle_strings: bool = False,
    include_shingles: bool = True,
    hash_kind: str = "md5",
) -> DataFrame:
    """docs(id, text) -> signatures (see module docstring).

    Rows with null/short text or fewer than one shingle are dropped (M2
    analog, ref :676-677 validity predicate) — never failed on (M6, ref
    :948-949).  ``hash_kind`` is the single base-hash knob:
    ``method='pandas'`` supports 'md5' (oracle-portable) and 'poly'
    (memoized-token polynomial, the at-scale fast path); ``method='sql'``
    supports 'md5' and 'xxhash64'.  ``include_shingles=False`` omits the
    shingle-hash arrays (~8x smaller rows); the verify stage then
    materializes sets for candidate docs only via ``shingle_sets_for``.
    """
    if method == "pandas" and not keep_shingle_strings:
        if hash_kind not in ("md5", "poly"):
            raise ValueError(f"method='pandas' supports hash_kind md5|poly, got {hash_kind!r}")
        from duplicate_image_detector_spark.partitioning import (
            ensure_min_parallelism,
        )

        # the md5 shingle hash is compute-dense (~3 ms/KB: one hashlib.md5
        # per shingle) — give it a small split target so even KB-scale
        # inputs fan out; the memoized 'poly' kernel is ~10x cheaper and
        # keeps the generic scan-split target (A/B: a global dense target
        # saved ~0.8 s on the md5 gates but cost the poly flagship ~6 s in
        # 32-task stage overhead)
        src = ensure_min_parallelism(
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            ).where(F.col("text").isNotNull()),
            **({"target_bytes": 16 << 10} if hash_kind == "md5" else {}),
        )
        schema = (
            SIGNATURE_SCHEMA_FULL if include_shingles else SIGNATURE_SCHEMA_SLIM
        ).format(id=_id_ddl(src))
        return src.mapInArrow(
            _signatures_gen(cfg, include_shingles, hash_kind), schema=schema
        )

    if hash_kind not in ("md5", "xxhash64"):
        raise ValueError(f"method='sql' supports hash_kind md5|xxhash64, got {hash_kind!r}")
    from duplicate_image_detector_spark.functions.hashing import (
        shingle_xxhash64_col,
    )

    w = words_col(F.col(text_col))
    base = docs.where(
        F.col(text_col).isNotNull()
        & (F.length(text_col) >= cfg.min_text_len)
    ).select(
        F.col(id_col).alias("doc_id"),
        text_sha256_col(F.col(text_col)).alias("text_sha256"),
        w.alias("words"),
        shingles_col(w, cfg.shingle_k).alias("shingles"),
    )
    hasher = shingle_md5_60bit_col if hash_kind == "md5" else shingle_xxhash64_col
    hashed = base.where(F.size("shingles") > 0).select(
        "doc_id",
        "text_sha256",
        F.size("words").alias("n_tokens"),
        F.size("shingles").alias("n_shingles"),
        *([F.col("shingles")] if keep_shingle_strings else []),
        F.array_sort(F.array_distinct(hasher(F.col("shingles")))).alias(
            "shingle_hashes"
        ),
    )
    return hashed.select(
        "*",
        minhash_col(F.col("shingle_hashes"), cfg).alias("minhash"),
        simhash_col("shingle_hashes", cfg).alias("simhash"),
    )


def jaccard_col(hashes_a: Column, hashes_b: Column) -> Column:
    """Exact Jaccard between two distinct-element arrays (JVM-side)."""
    inter = F.size(F.array_intersect(hashes_a, hashes_b))
    union = F.size(hashes_a) + F.size(hashes_b) - inter
    return inter.cast("double") / union.cast("double")
