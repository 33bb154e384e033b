"""Multimodal plumbing: schema, batching, corrupt-row tolerance, stub gate."""

from __future__ import annotations

import pytest

from duplicate_image_detector_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_media_features,
    py_decode_fake,
)


def _blob(w: int, h: int, payload: bytes = b"xyz") -> bytearray:
    return bytearray(b"FAKE" + w.to_bytes(4, "big") + h.to_bytes(4, "big") + payload)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img1", _blob(640, 480), "image"),
        ("img2", _blob(1920, 1080), "image"),
        ("bad", bytearray(b"NOTFAKE"), "image"),
        ("empty", None, "audio"),
    ]
    return spark.createDataFrame(rows, "url string, media binary, media_type string")


def test_decode_fake_roundtrip():
    w, h, payload = py_decode_fake(bytes(_blob(12, 34, b"pp")))
    assert (w, h, payload) == (12, 34, b"pp")


def test_decode_media_fake_codec(spark, media_df):
    out = {r["url"]: r for r in decode_media(media_df, codec="fake").collect()}
    assert out["img1"]["width"] == 640 and out["img1"]["height"] == 480
    assert out["img2"]["width"] == 1920
    assert out["bad"]["valid"] is False and out["bad"]["width"] == 0
    assert out["empty"]["valid"] is False and out["empty"]["n_bytes"] == 0
    assert len(out["img1"]["sha256"]) == 64


def test_decode_media_stub_raises(spark, media_df):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        decode_media(media_df, codec="stub").collect()
    assert "NotImplementedError" in str(exc.value) or "not available" in str(exc.value)


def test_feature_extraction_shape_and_determinism(spark, media_df):
    feats = extract_media_features(
        media_df.where("media is not null"), codec="fake"
    ).toPandas()
    assert set(feats.columns) == {"url", "feature"}
    assert all(len(f) == FEATURE_DIM for f in feats["feature"])
    again = extract_media_features(
        media_df.where("media is not null"), codec="fake"
    ).toPandas()
    a = {u: list(f) for u, f in zip(feats["url"], feats["feature"])}
    b = {u: list(f) for u, f in zip(again["url"], again["feature"])}
    assert a == b


def test_resize_media_fake(spark, media_df):
    from duplicate_image_detector_spark.functions.multimodal import (
        py_decode_fake as dec,
        resize_media,
    )

    out = {r["url"]: r for r in resize_media(media_df, max_side=100, codec="fake").collect()}
    # corrupt + null rows dropped
    assert set(out) == {"img1", "img2"}
    assert max(out["img1"]["width"], out["img1"]["height"]) <= 100
    assert max(out["img2"]["width"], out["img2"]["height"]) <= 100
    # aspect preserved (within integer truncation) and blob re-encoded
    w, h, _ = dec(bytes(out["img2"]["media"]))
    assert (w, h) == (out["img2"]["width"], out["img2"]["height"])
    assert abs(w / h - 1920 / 1080) < 0.05
    # already-small media unchanged
    same = {r["url"]: r for r in resize_media(media_df, max_side=4000, codec="fake").collect()}
    assert (same["img1"]["width"], same["img1"]["height"]) == (640, 480)


def test_sample_frames_fake(spark):
    from duplicate_image_detector_spark.functions.multimodal import (
        sample_frames,
    )

    payload = bytes(range(256)) * 4  # 1024 bytes = 16 frames of 64
    rows = [("vid1", _blob(8, 8, payload), "video"), ("bad", bytearray(b"nope"), "video")]
    df = spark.createDataFrame(rows, "url string, media binary, media_type string")
    out = sample_frames(df, every_n=2, frame_bytes=64, max_frames=5, codec="fake").collect()
    good = {
        (r["url"], r["frame_idx"]): bytes(r["frame"])
        for r in out
        if r["frame_idx"] >= 0
    }
    # every 2nd frame, capped at 5
    assert sorted(i for (_, i) in good) == [0, 2, 4, 6, 8]
    assert good[("vid1", 2)] == payload[2 * 64 : 3 * 64]
    assert all(u == "vid1" for (u, _) in good)
    # the corrupt row is SURFACED as an audit row, never silently dropped
    bad = [r for r in out if r["frame_idx"] < 0]
    assert [(r["url"], r["frame_idx"], r["frame"]) for r in bad] == [
        ("bad", -1, None)
    ]


def test_stub_raises_even_on_null_media(spark):
    """The stub gate is hoisted above the per-row null skip: an all-null
    media column must fail loudly, not yield an empty result."""
    from duplicate_image_detector_spark.functions.multimodal import (
        resize_media,
        sample_frames,
    )

    df = spark.createDataFrame(
        [("u1", None, "video")], "url string, media binary, media_type string"
    )
    for op in (resize_media, sample_frames):
        with pytest.raises(Exception) as exc:
            op(df).collect()
        assert "not available" in str(exc.value)


# ---------------------------------------------------------------------------
# codec capability probe ('auto' / 'pil')
# ---------------------------------------------------------------------------

def test_auto_codec_resolution():
    from duplicate_image_detector_spark.functions.multimodal import (
        _resolve_codec,
        has_pil,
    )

    resolved = _resolve_codec("auto")
    assert resolved == ("pil" if has_pil() else "stub")
    assert _resolve_codec("fake") == "fake"  # explicit codecs pass through


def test_auto_without_pil_fails_loudly(spark, media_df):
    from duplicate_image_detector_spark.functions.multimodal import has_pil

    if has_pil():
        pytest.skip("PIL installed: 'auto' resolves to the real codec")
    with pytest.raises(Exception) as exc:
        decode_media(media_df, codec="auto").collect()
    assert "NotImplementedError" in str(exc.value) or "not available" in str(
        exc.value
    )


@pytest.mark.skipif(
    not __import__(
        "duplicate_image_detector_spark.functions.multimodal",
        fromlist=["has_pil"],
    ).has_pil(),
    reason=(
        "needs the Pillow wheel (any >= 9.0; `pip install pillow`) — not "
        "installed in this container and no vendored copy exists "
        "(probed site-packages and the gcloud SDK tree).  The codec "
        "dispatch, 'auto' resolution, and Spark plumbing execute in the "
        "fake-codec tests above; only the real JPEG decode is wheel-bound."
    ),
)
def test_pil_real_jpeg_path(spark):
    """Real-codec integration: a genuine image decodes, resizes, and
    features through the same Spark plumbing as the fake codec."""
    import io

    from PIL import Image

    from duplicate_image_detector_spark.functions.multimodal import (
        resize_media,
    )

    buf = io.BytesIO()
    Image.new("RGB", (320, 200), color=(200, 30, 30)).save(buf, format="JPEG")
    rows = [("real1", bytearray(buf.getvalue()), "image"),
            ("bad", bytearray(b"NOTJPEG"), "image")]
    df = spark.createDataFrame(rows, "url string, media binary, media_type string")

    meta = {r["url"]: r for r in decode_media(df, codec="auto").collect()}
    assert meta["real1"]["width"] == 320 and meta["real1"]["height"] == 200
    assert meta["real1"]["valid"] is True
    assert meta["bad"]["valid"] is False

    resized = {r["url"]: r for r in resize_media(df, max_side=100, codec="auto").collect()}
    assert max(resized["real1"]["width"], resized["real1"]["height"]) <= 100
    assert "bad" not in resized  # corrupt rows dropped (M6)

    feats = extract_media_features(df, codec="auto").collect()
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats)
