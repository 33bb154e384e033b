"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages — the
same batch shape as the reference's DataLoader decode workers
(/root/reference/duplicate-detector.py:927-949, 1050-1057).

Codec resolution (``codec=`` on every stage):
  * ``'auto'``  — capability probe at stage-build time: uses Pillow when
    importable on the workers, else the loud stub.  The same wheel is
    production-real wherever the image libraries exist.
  * ``'pil'``   — real Pillow decode/resize/feature paths (image stages).
  * ``'fake'``  — deterministic test codec (below); no libraries needed.
  * ``'stub'``  — raises ``NotImplementedError`` at execution time on
    every partition (hoisted above null-skips, so it cannot silently
    yield empty output).  The default in this container, which has no
    image/audio libraries installed.
Frame sampling is a video stage: its real slot is ffmpeg/cv2 keyframe
extraction; ``'auto'`` resolves to cv2 when importable, else stub.

Everything Spark-side — schema, batching, partitioning, null-tolerance,
feature shape — is identical across codecs and tested with 'fake'.

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


def has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def has_cv2() -> bool:
    try:
        import cv2  # noqa: F401

        return True
    except ImportError:
        return False


def _resolve_codec(codec: str, video: bool = False) -> str:
    """'auto' -> the best codec importable HERE (driver side — local mode
    shares the env with workers; on a real cluster ship the probe result
    via the stage arg, or rely on identical images).  Unknown names pass
    through to the stage's own dispatch, which raises for them."""
    if codec != "auto":
        return codec
    if video:
        try:
            import cv2  # noqa: F401

            return "cv2"
        except ImportError:
            return "stub"
    return "pil" if has_pil() else "stub"


def _media_stage(media_df, cols, codec, stage_name, batch_fn, schema,
                 supported=("fake",)):
    """Shared mapInPandas wrapper for every media stage.

    One place for the batch shape and — critically — the codec gate: a
    codec the stage cannot actually run (``'stub'``, or a real codec whose
    library is missing) fails loudly on every partition, HOISTED above any
    per-row null-skip, so it can never silently yield an empty result.
    ``batch_fn(pdf)`` returns one pandas frame per Arrow batch.
    """

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        if codec not in supported:
            raise NotImplementedError(
                f"codec {codec!r} is not available for {stage_name} in "
                f"this environment (supported here: {list(supported)}); "
                "use codec='fake' for tests or install the real library"
            )
        for pdf in batches:
            yield batch_fn(pdf)

    return media_df.select(*cols).mapInPandas(gen, schema=schema)


def decode_media(media_df: DataFrame, codec: str = "stub") -> DataFrame:
    """(url, media binary, media_type) -> typed metadata rows.

    ``codec='auto'`` probes for Pillow and uses it when present;
    ``codec='pil'`` forces the real image decode; ``codec='fake'`` uses
    the deterministic test codec; ``codec='stub'`` raises
    NotImplementedError at execution time.  Corrupt rows yield
    valid=false, never fail the job (M6 tolerance, ref :948-949)."""
    codec = _resolve_codec(codec)

    def dims(raw: bytes) -> tuple[int, int]:
        if codec == "pil":
            import io as _io

            from PIL import Image

            with Image.open(_io.BytesIO(raw)) as im:
                return im.width, im.height
        w, h, _ = py_decode_fake(raw)
        return w, h

    def batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        out = {k: [] for k in ("url", "media_type", "width", "height", "n_bytes", "sha256", "valid")}
        for url, blob, mt in zip(pdf["url"], pdf["media"], pdf["media_type"]):
            raw = bytes(blob) if blob is not None else b""
            out["url"].append(url)
            out["media_type"].append(mt)
            out["n_bytes"].append(len(raw))
            out["sha256"].append(hashlib.sha256(raw).hexdigest())
            try:
                w, h = dims(raw)
                out["width"].append(w)
                out["height"].append(h)
                out["valid"].append(True)
            except Exception:
                out["width"].append(0)
                out["height"].append(0)
                out["valid"].append(False)
        return pd.DataFrame(
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

    return _media_stage(
        media_df,
        ("url", "media", "media_type"),
        codec,
        "media decode",
        batch,
        MEDIA_META_SCHEMA,
        supported=("fake", "pil") if has_pil() else ("fake",),
    )


RESIZED_SCHEMA = "url string, media binary, width int, height int"
FRAMES_SCHEMA = "url string, frame_idx int, frame binary"


def py_encode_fake(w: int, h: int, payload: bytes) -> bytes:
    return b"FAKE" + w.to_bytes(4, "big") + h.to_bytes(4, "big") + payload


def resize_media(
    media_df: DataFrame, max_side: int = 256, codec: str = "stub"
) -> DataFrame:
    """(url, media binary) -> (url, media binary, width, height) with
    max(width, height) <= max_side — the reference's pre-model resize
    (ref :850-925) as an Arrow-batched stage.  ``'pil'`` does a real
    thumbnail + PNG re-encode; the fake codec scales the header dims and
    truncates the payload proportionally (deterministic).  Corrupt rows
    are dropped (M6)."""
    codec = _resolve_codec(codec)

    def one(raw: bytes) -> tuple[bytes, int, int]:
        if codec == "pil":
            import io as _io

            from PIL import Image

            with Image.open(_io.BytesIO(raw)) as im:
                im.thumbnail((max_side, max_side))
                buf = _io.BytesIO()
                im.save(buf, format="PNG")
                return buf.getvalue(), im.width, im.height
        w, h, payload = py_decode_fake(raw)
        scale = min(1.0, max_side / max(w, h, 1))
        nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
        keep = max(int(len(payload) * scale * scale), 0)
        return py_encode_fake(nw, nh, payload[:keep]), nw, nh

    def batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        urls, blobs, ws, hs = [], [], [], []
        for url, blob in zip(pdf["url"], pdf["media"]):
            if blob is None:
                continue
            try:
                out, nw, nh = one(bytes(blob))
            except Exception:
                continue
            urls.append(url)
            blobs.append(out)
            ws.append(nw)
            hs.append(nh)
        return pd.DataFrame(
            {
                "url": urls,
                "media": blobs,
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
            }
        )

    return _media_stage(
        media_df, ("url", "media"), codec, "media resize", batch,
        RESIZED_SCHEMA,
        supported=("fake", "pil") if has_pil() else ("fake",),
    )


def sample_frames(
    media_df: DataFrame,
    every_n: int = 2,
    frame_bytes: int = 64,
    max_frames: int = 16,
    codec: str = "stub",
) -> DataFrame:
    """(url, media binary) -> one row per sampled frame (url, frame_idx,
    frame binary) — the video frame-sampling stage.  ``codec='auto'``
    resolves to cv2 when importable (every ``every_n``-th decoded frame,
    PNG-re-encoded, up to ``max_frames``), else the loud stub; the fake
    codec treats the payload as consecutive ``frame_bytes`` chunks with
    the same sampling rule.  Output explodes rows, so the stage runs
    BEFORE any shuffle of the (large) media column — downstream operators
    see only the (small) sampled frames.

    An UNDECODABLE input (cv2 cannot open it / zero frames decode / the
    fake header is corrupt) emits ONE error row ``(url, frame_idx=-1,
    frame=null)`` instead of silently contributing nothing — the
    _media_stage design note says decode problems must be observable,
    and a dropped row is indistinguishable from a frameless video.
    Filter ``frame_idx >= 0`` for the clean stream; count ``-1`` rows
    for the decode-failure audit."""
    codec = _resolve_codec(codec, video=True)

    def cv2_frames(raw: bytes) -> list[tuple[int, bytes]]:
        import os
        import tempfile

        import cv2

        # cv2.VideoCapture reads from a path, not a buffer
        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as fh:
            fh.write(raw)
            path = fh.name
        out: list[tuple[int, bytes]] = []
        idx = 0
        try:
            cap = cv2.VideoCapture(path)
            try:
                if not cap.isOpened():
                    raise ValueError("cv2 could not open media payload")
                while len(out) < max_frames:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    if idx % every_n == 0:
                        ok2, buf = cv2.imencode(".png", frame)
                        if ok2:
                            out.append((idx, buf.tobytes()))
                    idx += 1
            finally:
                cap.release()
        finally:
            os.unlink(path)
        if not out and idx == 0:
            raise ValueError("cv2 opened media but decoded zero frames")
        return out

    def batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        urls, idxs, frames = [], [], []
        for url, blob in zip(pdf["url"], pdf["media"]):
            if blob is None:
                continue
            try:
                if codec == "cv2":
                    sampled = cv2_frames(bytes(blob))
                else:
                    _, _, payload = py_decode_fake(bytes(blob))
                    n = len(payload) // frame_bytes
                    sampled = [
                        (i, payload[i * frame_bytes : (i + 1) * frame_bytes])
                        for i in range(0, n, every_n)
                    ][:max_frames]
            except Exception:
                sampled = [(-1, None)]  # decode-failure audit row
            for i, frame in sampled:
                urls.append(url)
                idxs.append(i)
                frames.append(frame)
        return pd.DataFrame(
            {
                "url": urls,
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": frames,
            }
        )

    return _media_stage(
        media_df, ("url", "media"), codec, "frame sampling", batch,
        FRAMES_SCHEMA,
        supported=("fake", "cv2") if has_cv2() else ("fake",),
    )


def extract_media_features(media_df: DataFrame, codec: str = "stub") -> DataFrame:
    """(url, media binary) -> (url, feature array<float>[FEATURE_DIM]).

    ``'pil'`` computes a real perceptual feature: the 8x8 grayscale
    thumbnail flattened to a 64-d L2-normalized vector (the same signal
    family as the reference's pHash pre-stage; the production slot is a
    batched model forward, ref :1024-1098).  The fake feature is an
    md5-seeded unit vector — deterministic, so downstream similarity
    operators (cosine_topk / ann_lsh_topk) are exercisable end-to-end
    without a model."""
    codec = _resolve_codec(codec)

    def feat(raw: bytes) -> np.ndarray:
        if codec == "pil":
            import io as _io

            from PIL import Image

            with Image.open(_io.BytesIO(raw)) as im:
                px = np.asarray(
                    im.convert("L").resize((8, 8)), dtype=np.float64
                ).ravel()
            n = np.linalg.norm(px)
            return (px / n if n > 0 else px).astype(np.float32)
        seed = int.from_bytes(hashlib.md5(raw).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(FEATURE_DIM)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        urls, feats = [], []
        for url, blob in zip(pdf["url"], pdf["media"]):
            raw = bytes(blob) if blob is not None else b""
            try:
                v = feat(raw)
            except Exception:
                continue  # corrupt image under 'pil': dropped (M6)
            urls.append(url)
            feats.append(v.tolist())
        return pd.DataFrame({"url": urls, "feature": feats})

    return _media_stage(
        media_df,
        ("url", "media"),
        codec,
        "feature extraction",
        batch,
        FEATURE_SCHEMA,
        supported=("fake", "pil") if has_pil() else ("fake",),
    )
