"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio libraries, so the actual media decode is
STUBBED (deterministic fake / NotImplementedError as flagged below); the
Spark-side plumbing — binary column handling, metadata schema, Arrow batch
shape of the mapInPandas decode stage, partition-preserving layout — is real
and tested. The `webpages.html` binary column stands in for media bytes.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from engine.relops import register, t
from engine.webpages import to_webpages

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """REAL decode is unavailable in this container (no PIL/opencv).
    Production swaps this for PIL.Image.open(BytesIO(payload)).size; here a
    deterministic fake derives dims from the checksum so the pipeline shape
    (schema, batching, partitioning) is fully exercised."""
    crc = zlib.crc32(payload)
    return 64 + crc % 1024, 64 + (crc >> 10) % 1024


def extract_audio_features(payload: bytes, n_mel: int = 8) -> list[float]:
    """Audio feature extraction with the codec decode STUBBED: production
    replaces the first line with a real decoder (soundfile/librosa — absent
    in this container); everything after — framing, per-frame energy, a
    coarse log-spectral summary — is real vectorized numpy over the sample
    array, so the feature pipeline shape (bytes → fixed-length float vector)
    is exercised end to end."""
    import numpy as np

    # STUB decode: interpret the payload bytes as 8-bit PCM samples
    samples = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    samples = (samples - 128.0) / 128.0
    if len(samples) == 0:
        return [0.0] * (n_mel + 2)
    if len(samples) < n_mel:  # zero-pad sub-band payloads (1..n_mel-1 bytes)
        samples = np.pad(samples, (0, n_mel - len(samples)))
    frame = len(samples) // n_mel
    usable = samples[: frame * n_mel].reshape(n_mel, frame)
    energy = np.sqrt((usable**2).mean(axis=1))  # per-band RMS
    zc = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    rms = float(np.sqrt((samples**2).mean()))
    return [rms, zc] + [float(x) for x in energy]


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Binary audio column → fixed-length feature vectors, Arrow-batched."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [p if p is not None else b"" for p in pdf["html"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "n_samples": [len(p) for p in payloads],
                    "features": [extract_audio_features(p) for p in payloads],
                }
            )

    return media.select("url", "html").mapInPandas(fn, AUDIO_SCHEMA)


def _media_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        payloads = [p if p is not None else b"" for p in pdf["html"]]
        dims = [decode_image(p) for p in payloads]
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "n_bytes": [len(p) for p in payloads],
                "checksum": [zlib.crc32(p) for p in payloads],
                "format": ["html" for _ in dims],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
            }
        )


def media_metadata(webpages: DataFrame) -> DataFrame:
    """Decode/feature-extract stage: binary column in, typed metadata out,
    Arrow-batched (the real 100 TB image pipeline has this exact shape)."""
    return webpages.select("url", "html").mapInPandas(
        _media_meta, MEDIA_META_SCHEMA
    )


@register(
    "multimodal_meta",
    """SELECT lang, count(*)::BIGINT AS n,
              round(avg(length(text) + 26), 4) AS avg_bytes
       FROM documents GROUP BY lang""",
)
def multimodal_meta(spark, sf_dir):
    """Binary-payload metadata aggregation: the html payload is
    '<html><body>'+text+'</body></html>' (12+14=26 wrapper bytes; fixture
    text is ascii so byte length == char length)."""
    wp = to_webpages(t(spark, sf_dir, "documents"))
    meta = media_metadata(wp)
    joined = meta.join(
        wp.select("url", "lang"), "url"
    )
    return joined.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
    )


# ---------------------------------------------------------------------------
# transform-stage plumbing: resize / frame-sample (decode stubbed, the
# Spark-side schema/batching/partitioning is real — SURVEY.md §2.C
# multimodal; the 100 TB image/video pipeline has exactly this shape)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for PIL resize: production replaces this body;
    the signature (bytes → bytes) and batch shape are the contract."""
    return zlib.compress(payload, 1)[: max(16, (w * h) // 64)]


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "width": width,
                    "height": height,
                    "thumb": [_fake_resize(p, width, height) for p in pdf["html"]],
                }
            )

    return media.select("url", "html").mapInPandas(fn, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, n_frames: int = 3) -> DataFrame:
    """Video frame sampling shape: one input row → n_frames output rows
    (expansion inside the Arrow batch, no explode shuffle needed)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        idx = np.arange(n_frames, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            # row-expansion via repeat/tile; only the per-payload byte slice
            # (the stubbed decode itself) touches each row individually
            yield pd.DataFrame(
                {
                    "url": np.repeat(pdf["url"].to_numpy(object), n_frames),
                    "frame_idx": np.tile(idx, n).astype(np.int32),
                    "frame_ts_ms": np.tile(idx * every_ms, n),
                    "frame": [
                        p[i::n_frames][:64]
                        for p in pdf["html"]
                        for i in range(n_frames)
                    ],
                }
            )

    return media.select("url", "html").mapInPandas(fn, FRAME_SCHEMA)
