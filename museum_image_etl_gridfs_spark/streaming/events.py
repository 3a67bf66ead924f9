"""Streaming event pipeline: file source -> windowed ops -> sink.

Design notes (scale posture):
- Every aggregation declares a watermark, so state for closed windows
  is dropped — without it a 100 TB stream accumulates state forever.
- ``availableNow`` triggers make each operator batch-equivalent and
  testable: the same logical plan over the same parquet yields the
  same rows as the batch query (asserted in tests/test_streaming.py).
- The custom stateful operator (running per-user totals) uses
  ``applyInPandasWithState`` — Spark's escape hatch for semantics the
  built-in windows can't express (SURVEY.md §2.9).

The driver's ``events.parquet`` is written as TIMESTAMP(NANOS), which
Spark's vectorized reader rejects; like ``catalog.load`` we read it
``nanosAsLong`` and convert to microseconds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: schema of events.parquet with ts as raw int64 nanos (nanosAsLong)
_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with ts normalized to a
    microsecond timestamp — the streaming twin of ``catalog.load``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source requires a directory: stream the sf_dir with a
    # glob filter rather than the single parquet file
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


def stream_tumbling_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows × event_type with late-data drop.

    State per (window, type) is freed once the watermark passes the
    window end — bounded memory at any stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def stream_sliding_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes (each event in 2)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def stream_session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows: per-user activity bursts separated by ``gap``.

    ``session_window`` merges overlapping per-event windows into
    variable-length sessions — the streaming-native form of the batch
    lag/running-sum sessionization in queries_events.user_sessions.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once by event_id: drop re-deliveries within the
    watermark horizon. State = one entry per id seen in the horizon —
    bounded, unlike a naive ``dropDuplicates`` whose state grows
    forever on an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``:
    per-user lifetime event count + value sum, emitted per batch.

    The built-in windows can't express "running total across all
    time, updated per micro-batch"; this is the documented pattern
    for such state (state object = (count, sum) per user key).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_parquet(
    stream: DataFrame, path: str, checkpoint: str, output_mode: str = "append"
) -> None:
    """Drain a stream into a Parquet directory with a checkpoint —
    the durable-sink form of :func:`run_to_memory`.

    The checkpoint carries the source offsets, so re-running after a
    crash (or when no new files arrived) writes NOTHING twice:
    exactly-once file output, the property the reference approximates
    with its transformed_gridfs_file_id skip marker
    (src/transform_load.py:83-84). Asserted in tests/test_streaming.py.
    """
    q = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(
    stream: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with an ``availableNow`` trigger
    into an in-memory table; returns the materialized result as a
    batch DataFrame. Blocks until the trigger drains the source."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream.sparkSession.table(name)
