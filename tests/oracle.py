"""Single-node brute-force oracle — the reference's semantics for text.

Transcribes the reference's logic exactly (SURVEY.md §5.2):
  * all-pairs Jaccard, upper-triangle, threshold — the blocked matmul
    theta-join at /root/reference/duplicate-detector.py:1404-1421;
  * union-find grouping — the DSU at :1758-1777 (py_dsu_components);
  * exact tier by content-key equality — metadata grouping at :1361-1372;
  * substring tier: exhaustive L-char-window match (exact, no sampling —
    stricter than the engine's content-defined sampling, so it bounds
    engine recall from above).

Pure Python/NumPy over a pandas frame; affordable only at fixture scale,
which is the point: golden outputs for the distributed engine.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pandas as pd

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.functions.text import (
    py_shingles,
    py_tokenize,
)
from duplicate_image_detector_spark.operators.components import (
    py_dsu_components,
)

TIER_PRIORITY = {"exact": 3, "near": 2, "substring": 1}


@dataclass
class OracleResult:
    pairs: pd.DataFrame     # url_a, url_b, score, tier  (url_a < url_b)
    clusters: pd.DataFrame  # url, cluster_id (min url), tier
    shingle_sets: dict = field(default_factory=dict)


def run_oracle(pages: pd.DataFrame, cfg: PipelineConfig) -> OracleResult:
    df = pages[["url", "text"]].copy()
    df = df[df["text"].notna() & (df["text"].str.len() >= cfg.min_text_len)]
    urls = df["url"].tolist()
    texts = dict(zip(df["url"], df["text"]))

    # --- exact tier (content-key grouping, ref :1361-1372) ---
    sha = {u: hashlib.sha256(texts[u].encode()).hexdigest() for u in urls}
    by_key: dict[str, list[str]] = {}
    for u in urls:
        by_key.setdefault(sha[u], []).append(u)
    exact_pairs = []
    for members in by_key.values():
        if len(members) >= 2:
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    exact_pairs.append((ms[i], ms[j], 1.0, "exact"))

    # --- near tier (all-pairs Jaccard, ref :1404-1421) ---
    shingle_sets = {
        u: py_shingles(py_tokenize(texts[u]), cfg.shingle_k) for u in urls
    }
    usable = [u for u in urls if shingle_sets[u]]
    near_pairs = []
    for i in range(len(usable)):
        a = usable[i]
        sa = shingle_sets[a]
        for j in range(i + 1, len(usable)):
            b = usable[j]
            sb = shingle_sets[b]
            inter = len(sa & sb)
            if inter == 0:
                continue
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= cfg.jaccard_threshold:
                x, y = sorted((a, b))
                near_pairs.append((x, y, jac, "near"))

    # --- substring tier (exhaustive L-window match) ---
    L = cfg.substring_min_len
    win_sets: dict[str, set[int]] = {}
    for u in usable:
        t = texts[u]
        s: set[int] = set()
        for i in range(0, max(0, len(t) - L + 1)):
            d = hashlib.md5(t[i : i + L].encode()).digest()
            s.add(int.from_bytes(d[:8], "big"))
        win_sets[u] = s
    sub_pairs = []
    for i in range(len(usable)):
        a = usable[i]
        if not win_sets[a]:
            continue
        for j in range(i + 1, len(usable)):
            b = usable[j]
            if win_sets[a] & win_sets[b]:
                x, y = sorted((a, b))
                sub_pairs.append((x, y, 0.5, "substring"))

    all_pairs = exact_pairs + near_pairs + sub_pairs
    pairs_df = pd.DataFrame(
        all_pairs, columns=["url_a", "url_b", "score", "tier"]
    )

    # --- grouping (DSU, ref :1758-1777) ---
    idx = {u: i for i, u in enumerate(urls)}
    rev = {i: u for u, i in idx.items()}
    edges = [(idx[a], idx[b]) for a, b, _, _ in all_pairs]
    comp = py_dsu_components(edges)
    # canonical cluster id = min url in component
    comp_members: dict[int, list[str]] = {}
    for node, root in comp.items():
        comp_members.setdefault(root, []).append(rev[node])
    cluster_rows = []
    tier_by_url: dict[str, int] = {}
    for a, b, _, t in all_pairs:
        p = TIER_PRIORITY[t]
        tier_by_url[a] = max(tier_by_url.get(a, 0), p)
        tier_by_url[b] = max(tier_by_url.get(b, 0), p)
    inv_priority = {v: k for k, v in TIER_PRIORITY.items()}
    for members in comp_members.values():
        cid = min(members)
        for u in members:
            cluster_rows.append((u, cid, inv_priority[tier_by_url[u]]))
    clusters_df = pd.DataFrame(
        cluster_rows, columns=["url", "cluster_id", "tier"]
    )
    return OracleResult(
        pairs=pairs_df, clusters=clusters_df, shingle_sets=shingle_sets
    )
