"""Multimodal plumbing tests: binary columns through Arrow-batched decode /
resize / frame-sample stages (decode itself stubbed — no media libs in the
container; SURVEY.md §2.C multimodal)."""

from __future__ import annotations

import pytest

from engine.multimodal import (
    audio_features,
    extract_audio_features,
    media_metadata,
    resize_images,
    sample_frames,
)
from engine.webpages import load_webpages
from tests.conftest import SF_DIR_001


def test_media_metadata_schema_and_determinism(spark):
    wp = load_webpages(spark, SF_DIR_001).limit(100)
    meta = media_metadata(wp)
    rows = {r["url"]: (r["n_bytes"], r["checksum"], r["width"], r["height"])
            for r in meta.collect()}
    assert len(rows) == 100
    rows2 = {r["url"]: (r["n_bytes"], r["checksum"], r["width"], r["height"])
             for r in media_metadata(wp).collect()}
    assert rows == rows2  # deterministic
    assert all(v[0] > 26 for v in rows.values())


def test_resize_and_frame_sample_shapes(spark):
    wp = load_webpages(spark, SF_DIR_001).limit(20)
    th = resize_images(wp, 32, 32)
    rows = th.collect()
    assert len(rows) == 20
    assert all(isinstance(r["thumb"], (bytes, bytearray)) for r in rows)
    fr = sample_frames(wp, every_ms=500, n_frames=3)
    frows = fr.collect()
    assert len(frows) == 60  # 1 row → 3 frames
    assert {r["frame_ts_ms"] for r in frows} == {0, 500, 1000}


def test_audio_features_shape_and_determinism(spark):
    """Decode is a documented stub (bytes→PCM reinterpret); the framing /
    RMS / zero-crossing math and the Spark batch shape are real."""
    wp = load_webpages(spark, SF_DIR_001).limit(10)
    rows = audio_features(wp).collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r["features"]) == 10  # rms, zc, 8 band energies
        assert all(0.0 <= f <= 1.5 for f in r["features"])
    # pure function of the payload
    f1 = extract_audio_features(b"RIFF....abcdef" * 10)
    f2 = extract_audio_features(b"RIFF....abcdef" * 10)
    assert f1 == f2
    assert extract_audio_features(b"") == [0.0] * 10


def test_audio_features_short_and_null_payloads(spark):
    """Round-3 advice: 1-7 byte payloads must not crash the reshape, and
    null html rows must be treated as empty audio, not a task failure."""
    from engine.multimodal import audio_features, extract_audio_features

    for n in range(0, 10):  # covers empty, sub-band (1..7), and >= n_mel
        feats = extract_audio_features(bytes(range(n)))
        assert len(feats) == 10 and all(f == f for f in feats)

    df = spark.createDataFrame(
        [("u://0", None), ("u://1", b"\x03"), ("u://2", b"0123456789")],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in audio_features(df).collect()}
    assert rows["u://0"]["n_samples"] == 0
    assert rows["u://1"]["n_samples"] == 1
    assert len(rows["u://2"]["features"]) == 10
