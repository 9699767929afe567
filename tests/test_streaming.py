"""Multi-batch Structured Streaming semantics (SURVEY.md §2.C streaming):
watermark + late-data drop, stateful per-key processing, streaming dedup —
driven over a file source with controlled micro-batches."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from engine.streamingops import (
    stateful_running_count,
    stateful_running_count_tws,
    watermarked_tumbling,
)

BASE = "2024-01-01 00:"


def _write(spark, path, rows):
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    df.select(
        "user_id", F.to_timestamp("ts").alias("ts"), "value"
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(spark, src, [(1, f"{BASE}01:00", 1.0), (1, f"{BASE}25:00", 1.0)])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = watermarked_tumbling(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark = 00:25 - 10min = 00:15 ⇒ window [00:00,00:10) finalized
        first = {
            (r["win_start"].minute, r["n"])
            for r in spark.table("wm_test").collect()
        }
        assert (0, 1) in first
        # late event at 00:02 (behind watermark) must be DROPPED; 00:42 event
        # advances the watermark so [00:20,00:30) finalizes with count 1
        _write(spark, src, [(1, f"{BASE}02:00", 1.0), (1, f"{BASE}42:00", 1.0)])
        q.processAllAvailable()
        rows = {
            (r["win_start"].minute, r["n"])
            for r in spark.table("wm_test").collect()
        }
        assert (0, 1) in rows  # late row did not create/extend window 0
        assert (20, 1) in rows
        assert (2, 1) not in rows
    finally:
        q.stop()


def test_stateful_running_count(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(spark, src, [(7, f"{BASE}01:00", 2.0), (7, f"{BASE}02:00", 3.0)])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_running_count(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, src, [(7, f"{BASE}03:00", 5.0)])
        q.processAllAvailable()
        rows = spark.table("state_test").orderBy("n_events").collect()
        # state accumulated across micro-batches: final n=3, sum=10
        assert (rows[-1]["n_events"], rows[-1]["sum_value"]) == (3, 10.0)
    finally:
        q.stop()


def test_stateful_running_count_tws(spark, tmp_path):
    """Spark 4 transformWithStateInPandas (StatefulProcessor + ValueState):
    same cross-batch accumulation contract as applyInPandasWithState.
    The TWS runtime needs google.protobuf (its state-server protocol), which
    this container lacks and installs are banned — skip there; the operator
    itself is environment-independent."""
    pytest.importorskip("google.protobuf")
    src = str(tmp_path / "src")
    _write(spark, src, [(9, f"{BASE}01:00", 2.0), (9, f"{BASE}02:00", 3.0)])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_running_count_tws(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_tws"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, src, [(9, f"{BASE}03:00", 5.0)])
        q.processAllAvailable()
        rows = spark.table("tws_test").orderBy("n_events").collect()
        assert (rows[-1]["n_events"], rows[-1]["sum_value"]) == (3, 10.0)
    finally:
        q.stop()


def test_streaming_dedup_with_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(spark, src, [(1, f"{BASE}01:00", 1.0), (1, f"{BASE}01:00", 1.0)])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["user_id", "ts"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dd_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("dd_test").count() == 1
    finally:
        q.stop()
