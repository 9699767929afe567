"""Canonical engine input: the Iceberg-shaped `webpages` table mandated by
BASELINE.json:15 — (url:string, warc_ts:timestamp, html:binary, text:string,
lang:string) — derived deterministically from the driver's `documents`
fixture exactly as specified in FIXTURES.md §1.1 (no randomness)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def to_webpages(documents: DataFrame) -> DataFrame:
    """FIXTURES.md §1.1 mapping, verbatim."""
    return documents.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id") * 60)
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "utf-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def load_webpages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return to_webpages(load_documents(spark, sf_dir))


def with_recrawl(webpages: DataFrame) -> DataFrame:
    """FIXTURES.md §1.1 dedup fixture: every url whose trailing doc number is
    ≡ 0 (mod 10) gets a duplicate crawl one day later with ` dup` appended —
    latest-crawl dedup must keep only the newer row."""
    doc_no = F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long")
    dups = (
        webpages.filter(doc_no % 10 == 0)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("interval 1 day"))
        .withColumn("text", F.concat(F.col("text"), F.lit(" dup")))
        .withColumn(
            "html",
            F.encode(
                F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
                "utf-8",
            ),
        )
    )
    return webpages.unionByName(dups)


def replicate_webpages(webpages: DataFrame, factor: int) -> DataFrame:
    """Deterministically scale the corpus ×factor for benchmarks (driver
    note: synthesize the input shape at small scale — no external data).
    Each replica gets a unique url suffix; text is unchanged so per-doc work
    is representative."""
    if factor <= 1:
        return webpages
    return webpages.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    ).select(
        F.concat(F.col("url"), F.lit("?r="), F.col("_r")).alias("url"),
        F.col("warc_ts"),
        F.col("html"),
        F.col("text"),
        F.col("lang"),
    )
