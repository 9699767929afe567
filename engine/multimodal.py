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


def extract_audio_features(payload: bytes):  # pragma: no cover - stub
    raise NotImplementedError(
        "audio feature extraction requires libs not present in this container"
    )


def _media_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        payloads = pdf["html"]
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
        for pdf in batches:
            if len(pdf) == 0:
                continue
            urls, idxs, tss, frames = [], [], [], []
            for url, payload in zip(pdf["url"], pdf["html"]):
                for i in range(n_frames):
                    urls.append(url)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    # deterministic fake frame: slice of the payload
                    frames.append(payload[i::n_frames][:64])
            yield pd.DataFrame(
                {"url": urls, "frame_idx": idxs, "frame_ts_ms": tss, "frame": frames}
            )

    return media.select("url", "html").mapInPandas(fn, FRAME_SCHEMA)
