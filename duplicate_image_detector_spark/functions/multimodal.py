"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages — the
same batch shape as the reference's DataLoader decode workers
(/root/reference/duplicate-detector.py:927-949, 1050-1057).

The decode kernels themselves are STUBS in this container (no image/audio
libraries installed): ``decode_media`` raises ``NotImplementedError``
unless the deterministic fake codec is selected.  Everything Spark-side —
schema, batching, partitioning, null-tolerance, feature shape — is real
and tested, so swapping in a real codec is a one-function change.

Fake codec format (used by tests):
    b"FAKE" + width:4 bytes BE + height:4 bytes BE + payload
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

MEDIA_META_SCHEMA = (
    "url string, media_type string, width int, height int, n_bytes long, "
    "sha256 string, valid boolean"
)

FEATURE_DIM = 64
FEATURE_SCHEMA = f"url string, feature array<float>"


def py_decode_fake(data: bytes) -> tuple[int, int, bytes]:
    """Deterministic fake decoder; raises ValueError on corrupt input."""
    if len(data) < 12 or data[:4] != b"FAKE":
        raise ValueError("not a FAKE media blob")
    w = int.from_bytes(data[4:8], "big")
    h = int.from_bytes(data[8:12], "big")
    return w, h, data[12:]


def decode_media(media_df: DataFrame, codec: str = "stub") -> DataFrame:
    """(url, media binary, media_type) -> typed metadata rows.

    ``codec='fake'`` uses the deterministic test codec; ``codec='stub'``
    raises NotImplementedError at execution time (the production slot for
    PIL/opencv/ffmpeg).  Corrupt rows yield valid=false, never fail the
    job (M6 tolerance, ref :948-949)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("url", "media_type", "width", "height", "n_bytes", "sha256", "valid")}
            for url, blob, mt in zip(pdf["url"], pdf["media"], pdf["media_type"]):
                raw = bytes(blob) if blob is not None else b""
                out["url"].append(url)
                out["media_type"].append(mt)
                out["n_bytes"].append(len(raw))
                out["sha256"].append(hashlib.sha256(raw).hexdigest())
                try:
                    if codec == "stub":
                        raise NotImplementedError(
                            "real media decode not available in this "
                            "environment; use codec='fake' or plug a codec in"
                        )
                    w, h, _ = py_decode_fake(raw)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["valid"].append(True)
                except NotImplementedError:
                    raise
                except Exception:
                    out["width"].append(0)
                    out["height"].append(0)
                    out["valid"].append(False)
            yield pd.DataFrame(
                {
                    "url": out["url"],
                    "media_type": out["media_type"],
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
                    "sha256": out["sha256"],
                    "valid": pd.Series(out["valid"], dtype="bool"),
                }
            )

    return media_df.select("url", "media", "media_type").mapInPandas(
        gen, schema=MEDIA_META_SCHEMA
    )


def extract_media_features(media_df: DataFrame, codec: str = "stub") -> DataFrame:
    """(url, media binary) -> (url, feature array<float>[FEATURE_DIM]).

    The fake feature is an md5-seeded unit vector — deterministic, so
    downstream similarity operators (cosine_topk / ann_lsh_topk) are
    exercisable end-to-end without a model.  The production slot is a
    batched model forward (ref :1024-1098)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            urls, feats = [], []
            for url, blob in zip(pdf["url"], pdf["media"]):
                raw = bytes(blob) if blob is not None else b""
                if codec == "stub":
                    raise NotImplementedError(
                        "real feature extraction not available; use codec='fake'"
                    )
                seed = int.from_bytes(hashlib.md5(raw).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(FEATURE_DIM)
                v = (v / np.linalg.norm(v)).astype(np.float32)
                urls.append(url)
                feats.append(v.tolist())
            yield pd.DataFrame({"url": urls, "feature": feats})

    return media_df.select("url", "media").mapInPandas(gen, schema=FEATURE_SCHEMA)
