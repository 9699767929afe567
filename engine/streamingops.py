"""Structured Streaming operator surface (SURVEY.md §2.C streaming), over the
`events` fixture replayed as a file stream (reference analog: the hourly cron
incremental re-ingest, A17 [R]).

Driver-checkable entries replay the whole fixture with
``trigger(availableNow)`` into a memory sink and return the result table —
for tumbling/sliding windows and dedup the final streaming state equals the
batch answer, so each carries a DuckDB oracle. Watermark/late-data and
stateful-processor semantics (which need multi-batch timelines) live in
tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from engine.relops import register, t


_STREAM_DIRS: dict[str, str] = {}


def _events_dir(sf_dir: str) -> str:
    # the file stream source requires a directory; stage a copy once
    if sf_dir not in _STREAM_DIRS:
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="events_stream_")
        shutil.copy(f"{sf_dir}/events.parquet", d)
        _STREAM_DIRS[sf_dir] = d
    return _STREAM_DIRS[sf_dir]


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = t(spark, sf_dir, "events").schema
    return spark.readStream.schema(schema).parquet(_events_dir(sf_dir))


def _run_to_memory(df: DataFrame, mode: str = "complete") -> DataFrame:
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


@register(
    "stream_tumbling_window",
    """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start_epoch,
              count(*)::BIGINT AS n, round(sum(value), 2) AS sum_val
       FROM events GROUP BY 1""",
)
def stream_tumbling_window(spark, sf_dir):
    s = _events_stream(spark, sf_dir)
    agg = s.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_val")
    )
    out = _run_to_memory(agg)
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("win_start_epoch"), "n", "sum_val"
    )


@register(
    "stream_sliding_window",
    """SELECT CAST(floor(epoch(ts) / 300) * 300 - o AS BIGINT) AS win_start_epoch,
              count(*)::BIGINT AS n
       FROM events CROSS JOIN (VALUES (0), (300)) offs(o)
       GROUP BY 1""",
)
def stream_sliding_window(spark, sf_dir):
    s = _events_stream(spark, sf_dir)
    agg = s.groupBy(
        F.window("ts", "10 minutes", "5 minutes").alias("w")
    ).agg(F.count("*").alias("n"))
    out = _run_to_memory(agg)
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("win_start_epoch"), "n"
    )


@register(
    "stream_session_window",
    """WITH x AS (
         SELECT user_id, ts, event_id,
                floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))) AS gap
         FROM events),
       sess AS (
         SELECT user_id, ts,
                sum(CASE WHEN gap IS NULL OR gap >= 300 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
         FROM x)
       SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
              count(*)::BIGINT AS n_events
       FROM sess GROUP BY user_id, sid""",
)
def stream_session_window(spark, sf_dir):
    """session_window(ts, 5 min) per user — run in batch mode (identical
    operator; streaming-mode session windows with watermarks are covered in
    tests/test_streaming.py). Oracle = lag-gap sessionization, the published
    equivalent semantics."""
    e = t(spark, sf_dir, "events")
    agg = e.groupBy(
        F.session_window("ts", "5 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    return agg.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).alias("session_start_epoch"),
        "n_events",
    )


@register(
    "stream_dedup",
    """SELECT event_type, count(*)::BIGINT AS n
       FROM events GROUP BY event_type""",
)
def stream_dedup(spark, sf_dir):
    """Streaming dedup on event_id: the source is unioned with itself (every
    event arrives twice); dropDuplicates restores exact-once counts."""
    s = _events_stream(spark, sf_dir)
    doubled = s.union(_events_stream(spark, sf_dir))
    deduped = doubled.dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n"))
    return _run_to_memory(agg)


@register(
    "stream_static_join",
    """SELECT d.lang, count(*)::BIGINT AS n, round(sum(e.value), 2) AS sum_val
       FROM events e JOIN documents d ON e.user_id = d.doc_id
       GROUP BY d.lang""",
)
def stream_static_join(spark, sf_dir):
    s = _events_stream(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = s.join(docs, s.user_id == docs.doc_id)
    agg = joined.groupBy("lang").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_val")
    )
    return _run_to_memory(agg)


# ---------------------------------------------------------------------------
# multi-batch streaming semantics (pytest-verified: watermark late-data drop,
# stateful per-key processing) — SURVEY.md §2.C streaming rows
# ---------------------------------------------------------------------------


def watermarked_tumbling(stream_df: DataFrame, watermark: str = "10 minutes",
                         window: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts with watermark: in append mode a window is
    emitted only once finalized, and events older than the watermark are
    dropped (late-data semantics tested across micro-batches)."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )


def stateful_running_count(stream_df: DataFrame) -> DataFrame:
    """Custom stateful per-key operator via applyInPandasWithState: running
    event count + value sum per user, persisted in state across batches
    (B15-adjacent: the engine's stateful surface)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_running_count_tws(stream_df: DataFrame) -> DataFrame:
    """Same running per-user aggregate on the Spark 4.x stateful surface:
    transformWithStateInPandas with a StatefulProcessor + typed ValueState
    (the arbitrary-state API that supersedes applyInPandasWithState; needs
    the RocksDB state store provider, set in engine.session defaults).
    Runtime dependency: the TWS state-server protocol imports
    google.protobuf — absent in this sandbox (installs banned), so the
    pytest is importorskip-gated; applyInPandasWithState above covers the
    same semantics in-sandbox."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("acc", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningCount(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
