"""Substring tier: long exact shared spans the signature stages miss.

North-rule addition with no reference analog (the reference's nearest idea
is its two-tier exact-vs-near split, /root/reference/TECHNICAL.md:7-15):
two documents sharing one verbatim span of >= L chars can still have overall
Jaccard << 0.86, so a dedicated stage flags them as ``tier='substring'``.

Scale design (no suffix array over 100 TB of concatenated text):

1. **Content-defined fingerprint sampling** (mapInPandas, NumPy-vectorized):
   per document, a Karp-Rabin rolling hash over every k-char gram; positions
   whose weak hash ≡ 0 (mod s) are *selected* — selection depends only on
   local content, so the same span selects the same positions in every
   document containing it.  Each selected gram is identified by a strong
   md5-based 64-bit fingerprint.  A shared span of length L contains
   L-k+1 grams, so the probability that none is selected is
   (1-1/s)^(L-k+1) — at the pinned config (k=64, s=32, L=400) ≈ 2.4e-5,
   inside the 0.99 recall budget.
2. **Candidate pairs**: fingerprint equi-join (group-by fingerprint,
   bucket-capped like the LSH stage).
3. **Verification**: anchored extension — shared selected grams give
   (pos_a, pos_b) anchors; each anchor is verified by direct slice
   comparison (false-fp collisions die here) and extended to its maximal
   common run by binary search over slice equality (O(log n) C-speed
   memcmps instead of an interpreted per-character walk; measured ~100x
   vs the suffix automaton on 100 KB docs).  The reported ``span_len``
   is the longest anchored maximal run: equal to the exact LCS whenever
   the optimal span contains a selected gram among the first
   ``max_anchors`` occurrences of its fingerprint — misses are the SAME
   (1-1/s)^(L-k+1) sampling event the candidate stage already budgets
   (≈2.4e-5 at the pinned config), so the stage's recall guarantee is
   unchanged.  The textbook suffix automaton
   (``py_longest_common_substring``) is kept as the exact test oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.config import PipelineConfig

if TYPE_CHECKING:
    import pandas as pd

_KR_BASE = 131
_KR_MOD = (1 << 31) - 1


def _kr_selected_positions(text: str, k: int, mod: int) -> np.ndarray:
    """Char positions whose k-gram's Karp-Rabin weak hash ≡ 0 (mod s)."""
    n = len(text)
    if n < k:
        return np.empty(0, dtype=np.int64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    m = n - k + 1
    h = np.zeros(m, dtype=np.int64)
    for j in range(k):
        h = (h * _KR_BASE + codes[j : j + m]) % _KR_MOD
    return np.nonzero(h % mod == 0)[0]


def _strong_fp(gram: str) -> int:
    d = hashlib.md5(gram.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big") >> 1  # 63-bit, non-negative


def py_select_fingerprints(text: str, k: int, mod: int) -> set[int]:
    """Strong 64-bit fingerprints of content-selected k-grams (NumPy)."""
    return {
        _strong_fp(text[int(i) : int(i) + k])
        for i in _kr_selected_positions(text, k, mod)
    }


def py_select_fingerprint_positions(
    text: str, k: int, mod: int
) -> dict[int, list[int]]:
    """fingerprint -> ascending char positions of its selected occurrences
    (the anchor table the verification stage extends from)."""
    out: dict[int, list[int]] = {}
    for i in _kr_selected_positions(text, k, mod):
        out.setdefault(_strong_fp(text[int(i) : int(i) + k]), []).append(int(i))
    return out


def _max_eq(pred, lo: int, hi: int) -> int:
    """Largest e in [lo, hi] with pred(e), given pred(lo) holds and pred is
    monotone (true prefix) — binary search, O(log) slice comparisons."""
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if pred(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def py_anchored_span(
    ta: str,
    tb: str,
    fa: dict[int, list[int]],
    fb: dict[int, list[int]],
    k: int,
    max_anchors: int = 4,
) -> int:
    """Longest common substring CONTAINING a shared selected gram: each
    (pos_a, pos_b) anchor pair is slice-verified (md5-collision false
    anchors rejected by direct comparison) and extended left/right to its
    maximal common run via binary search over slice equality — every
    comparison is a C-level memcmp.  Anchors already inside a computed run
    on the same diagonal are skipped; per-fingerprint anchor fan-out is
    capped at ``max_anchors`` per side (repetitive text guard)."""
    best = 0
    cover: dict[int, list[tuple[int, int]]] = {}
    for fp in fa.keys() & fb.keys():
        for pa in fa[fp][:max_anchors]:
            for pb in fb[fp][:max_anchors]:
                diag = pa - pb
                ivs = cover.setdefault(diag, [])
                if any(s <= pa < e for s, e in ivs):
                    continue
                if ta[pa : pa + k] != tb[pb : pb + k]:
                    continue  # weak/strong hash collision, not a real match
                r = _max_eq(
                    lambda e: ta[pa : pa + e] == tb[pb : pb + e],
                    k,
                    min(len(ta) - pa, len(tb) - pb),
                )
                left = _max_eq(
                    lambda e: ta[pa - e : pa] == tb[pb - e : pb],
                    0,
                    min(pa, pb),
                )
                ivs.append((pa - left, pa + r))
                if left + r > best:
                    best = left + r
    return best


def fingerprint_docs(
    docs: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs -> (doc_id, fp BIGINT), distinct per doc.

    id-type-agnostic: the id value is passed through untouched (BIGINT or
    the 128-bit struct, which pandas carries as a dict), so the output
    schema follows the input's doc_id type."""
    k, mod = cfg.substring_gram, cfg.substring_mod

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids: list = []
            fps: list[int] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                for fp in py_select_fingerprints(str(text), k, mod):
                    ids.append(doc_id)
                    fps.append(fp)
            # int64 ids stay an int64 Series (object dtype would box every
            # id on the default 64-bit path); struct ids arrive as dicts
            # and need the object dtype
            id_dtype = (
                "int64"
                if pdf["doc_id"].dtype.kind in "iu"
                else "object"
            )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=id_dtype),
                    "fp": pd.Series(fps, dtype="int64"),
                }
            )

    from duplicate_image_detector_spark.partitioning import (
        ensure_min_parallelism,
    )

    src = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )
    id_ddl = src.schema["doc_id"].dataType.simpleString()
    return src.mapInPandas(gen, schema=f"doc_id {id_ddl}, fp bigint")


def fingerprint_candidate_pairs(
    fps: DataFrame,
    cfg: PipelineConfig,
    cache_registry: list | None = None,
) -> DataFrame:
    """(doc_id, fp) -> candidate (id_a < id_b), bucket-capped like LSH.

    Same skew-safe shape as ``lsh_candidate_pairs``: partial-aggregating
    ``groupBy`` bucket stats joined back (no hot-key single-task window),
    eager cache of the multi-member rows for the two self-join sides,
    cache dropped before returning (output persisted instead).
    """
    from pyspark.storagelevel import StorageLevel

    stats = (
        fps.groupBy("fp")
        .agg(
            F.count("*").alias("bucket_size"),
            F.min("doc_id").alias("pivot_id"),
        )
        .where(F.col("bucket_size") >= 2)  # singleton fps never join
    )
    multi = fps.join(stats, "fp").persist(StorageLevel.MEMORY_AND_DISK)
    multi.count()  # eager: both self-join sides read the cache
    normal = multi.where(F.col("bucket_size") <= cfg.max_bucket)
    left = normal.select("fp", F.col("doc_id").alias("id_a"))
    right = normal.select("fp", F.col("doc_id").alias("id_b"))
    joined = left.join(right, "fp").where(F.col("id_a") < F.col("id_b"))
    pivoted = (
        multi.where(F.col("bucket_size") > cfg.max_bucket)
        .where(F.col("doc_id") != F.col("pivot_id"))
        .select(F.col("pivot_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    out = joined.select("id_a", "id_b").union(pivoted).dropDuplicates(
        ["id_a", "id_b"]
    )
    if cache_registry is not None:
        # deferred mode (see lsh_candidate_pairs): the caller materializes
        # the verified output once and releases the fp cache afterwards
        cache_registry.append(multi)
        return out
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    multi.unpersist()
    return out


def py_longest_common_substring(a: str, b: str) -> int:
    """Length of the longest common substring — suffix automaton of ``a``
    walked with ``b``; O(|a|+|b|) time (standard construction)."""
    # build suffix automaton of a
    MAXN = 2 * len(a) + 5
    nxt: list[dict[str, int]] = [dict() for _ in range(MAXN)]
    link = [0] * MAXN
    length = [0] * MAXN
    link[0] = -1
    last, size = 0, 1
    for ch in a:
        cur = size
        size += 1
        length[cur] = length[last] + 1
        p = last
        while p != -1 and ch not in nxt[p]:
            nxt[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = nxt[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = size
                size += 1
                length[clone] = length[p] + 1
                nxt[clone] = dict(nxt[q])
                link[clone] = link[q]
                while p != -1 and nxt[p].get(ch) == q:
                    nxt[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # walk b
    v, cur_len, best = 0, 0, 0
    for ch in b:
        while v and ch not in nxt[v]:
            v = link[v]
            cur_len = length[v]
        if ch in nxt[v]:
            v = nxt[v][ch]
            cur_len += 1
            if cur_len > best:
                best = cur_len
        else:
            v, cur_len = 0, 0
    return best


def substring_pairs(
    docs: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_registry: list | None = None,
) -> DataFrame:
    """docs -> verified (id_a, id_b, span_len, tier='substring') pairs
    sharing an exact span >= cfg.substring_min_len chars.

    ``cache_registry``: deferred-cache mode (see
    ``fingerprint_candidate_pairs``) — the candidate set is not
    materialized here; the caller materializes the returned output once
    and then unpersists the handed-over internal caches."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).where(F.col("text").isNotNull())
    cands = fingerprint_candidate_pairs(
        fingerprint_docs(src, cfg), cfg, cache_registry=cache_registry
    )
    return verify_span_pairs(cands, src, cfg)


def verify_span_pairs(
    cands: DataFrame, src: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Candidate (id_a, id_b) pairs + (doc_id, text) source -> verified
    (id_a, id_b, span_len, tier='substring') rows with a shared exact
    span >= cfg.substring_min_len chars.  The verify stage of
    ``substring_pairs``, exposed so candidate generation can come from
    elsewhere (e.g. the incremental daily loop's delta-vs-corpus
    fingerprint join) while the span kernel stays one code path."""
    with_text = (
        cands.join(src.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb")), "id_b")
    )
    min_len, gram, mod = cfg.substring_min_len, cfg.substring_gram, cfg.substring_mod

    def verify(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # per-worker anchor-table memo: a doc appearing in many candidate
        # pairs fingerprints once, not once per pair (the automaton path
        # this replaces paid per-pair regardless)
        memo: dict[str, dict[int, list[int]]] = {}

        def anchors(t: str) -> dict[int, list[int]]:
            got = memo.get(t)
            if got is None:
                if len(memo) > 512:  # bound worker memory on huge corpora
                    memo.clear()
                got = memo[t] = py_select_fingerprint_positions(t, gram, mod)
            return got

        for pdf in batches:
            rows = []
            for ia, ib, ta, tb in zip(
                pdf["id_a"], pdf["id_b"], pdf["_ta"], pdf["_tb"]
            ):
                ta, tb = str(ta), str(tb)
                span = py_anchored_span(ta, tb, anchors(ta), anchors(tb), gram)
                if span >= min_len:
                    rows.append((ia, ib, int(span)))  # ids pass through
            # int64 ids stay int64 Series on the default 64-bit path (same
            # branch as fingerprint_docs above); struct ids need object
            id_dtype = (
                "int64" if pdf["id_a"].dtype.kind in "iu" else "object"
            )
            yield pd.DataFrame(
                {
                    "id_a": pd.Series([r[0] for r in rows], dtype=id_dtype),
                    "id_b": pd.Series([r[1] for r in rows], dtype=id_dtype),
                    "span_len": pd.Series([r[2] for r in rows], dtype="int64"),
                }
            )

    id_ddl = src.schema["doc_id"].dataType.simpleString()
    out = with_text.mapInPandas(
        verify, schema=f"id_a {id_ddl}, id_b {id_ddl}, span_len bigint"
    )
    return out.select("*", F.lit("substring").alias("tier"))
