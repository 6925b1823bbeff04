"""Real-codec multimodal paths — presence-gated: these tests RUN on a
host with PIL / PyAV installed and SKIP (not stub) where the codecs
are absent. The fake-decoder plumbing tests in test_spark_ops.py are
unconditional either way."""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL.Image")


def _png_bytes(w: int, h: int, color: int) -> bytes:
    img = PIL.new("L", (w, h), color=color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def png_media(spark):
    rows = [(i, _png_bytes(12, 6, 40 + i * 20)) for i in range(5)]
    return spark.createDataFrame(
        rows, "media_id long, media binary"
    )


def test_extract_features_real_decodes_png(spark, png_media):
    from cuckoofilter_spark.operators.multimodal import extract_features

    rows = extract_features(png_media, decoder="real", n_feat=8).collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # constant-color images: features reflect the planted intensity
    by_id = {r["media_id"]: r["feature"] for r in rows}
    assert by_id[0][0] < by_id[4][0]


def test_resize_media_real_roundtrips_png(spark, png_media):
    from cuckoofilter_spark.operators.multimodal import resize_media

    rows = resize_media(png_media, width=4, height=3,
                        decoder="real").collect()
    assert len(rows) == 5
    for r in rows:
        img = PIL.open(io.BytesIO(bytes(r["media"])))
        assert img.size == (4, 3)
        assert r["meta"]["kind"] == "image/png"


def test_sample_frames_real_needs_pyav(spark, png_media):
    import importlib.util

    from cuckoofilter_spark.operators.multimodal import sample_frames

    if importlib.util.find_spec("av") is None:
        with pytest.raises(
            Exception, match="NotImplementedError|not installed"
        ):
            sample_frames(png_media, decoder="real").collect()
        return
    # with PyAV present a PNG is not a video container — expect a
    # decode error, not the missing-codec refusal
    with pytest.raises(Exception):
        sample_frames(png_media, decoder="real").collect()
