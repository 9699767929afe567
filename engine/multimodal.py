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
