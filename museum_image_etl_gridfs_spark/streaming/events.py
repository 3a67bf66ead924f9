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

``events.ts``'s physical parquet type varies by fixture generation
(NANOS vs MICROS/NTZ); both the batch and this streaming reader go
through ``catalog.normalize_events_ts`` so they cannot diverge.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import normalize_events_ts
from ..operators.lifecycle import release_df, tracked_local_checkpoint


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with ts normalized to a
    session-tz timestamp — the streaming twin of ``catalog.load``.

    The file source requires an explicit schema; rather than hardcode
    one physical layout, probe it with a batch scan (footer read only)
    and reuse the batch normalizer on the streaming DataFrame.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    probed = spark.read.parquet(path).schema
    # the file source requires a directory: stream the sf_dir with a
    # glob filter rather than the single parquet file
    raw = (
        spark.readStream.schema(probed)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_events_ts(raw)


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


def stream_enriched_segment_counts(
    events: DataFrame, dim: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static enrichment join → tumbling per-segment rollup.

    The canonical streaming-ETL shape: an unbounded fact stream joined
    to a bounded dimension (here customer market segment; at scale any
    slowly-changing dim snapshot), then windowed. The static side is
    explicitly ``broadcast()`` — a stream-static join must never
    shuffle the stream per micro-batch, and the dim re-reads per batch
    pick up dim updates for free. Only the stream side carries a
    watermark; window state drops once the watermark passes."""
    seg = F.broadcast(dim.select("c_custkey", "c_mktsegment"))
    return (
        events.withWatermark("ts", watermark)
        .join(seg, events["user_id"] == seg["c_custkey"])
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment", "n", "sum_value",
        )
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


def stream_hourly_ohlc_bars(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Hourly OHLC bars on the value stream — argmin/argmax in a
    watermarked tumbling window, the streaming twin of the batch
    ``hourly_ohlc`` query.

    Open/close ride on struct-min/struct-max (lexicographic on
    (ts, event_id, value)): plain min/max aggregates, so Spark keeps
    one partially-merged struct per open window — state is O(open
    windows), closed-window state drops at the watermark.
    """
    pick = F.struct("ts", "event_id", "value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.min(pick)["value"].alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(pick)["value"].alias("close_v"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "open_v", "high_v", "low_v", "close_v", "n_events",
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


def stream_expiring_sessions(
    events: DataFrame, gap_ms: int = 1_800_000, watermark: str = "30 minutes"
) -> DataFrame:
    """Sessionization with EVENT-TIME TIMEOUT expiry: a per-user
    session closes (and is emitted, exactly once) when the watermark
    passes its last activity + ``gap_ms``.

    This is the semantic ``session_window`` can't give you in append
    mode with custom per-session state, and the reference's batch
    world can't express at all: an unbounded stream where each
    session is finalized the moment event time proves no more events
    can join it (SURVEY.md §2.9). State per user is one open-session
    triple (start, end, n) — bounded by active users, not history;
    expiry is driven by ``GroupStateTimeout.EventTimeTimeout``, so an
    idle user's state is dropped by the engine, not by a scan.

    Emission paths:
    - timeout fires (watermark > last activity + gap): emit the open
      session, remove state;
    - an in-batch gap larger than ``gap_ms`` splits sessions: all but
      the last are closed and emitted immediately, the last becomes
      the open state with its timeout re-armed.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        def frame(rows):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_start": [pd.to_datetime(s, unit="ms") for s, _, _ in rows],
                    "session_end": [pd.to_datetime(e, unit="ms") for _, e, _ in rows],
                    "n_events": [n for _, _, n in rows],
                }
            )

        if state.hasTimedOut:
            closed = tuple(state.get)
            state.remove()
            yield frame([closed])
            return

        ts = sorted(
            int(v)  # epoch ms; dt.floor to match epoch_ms truncation
            for pdf in pdfs
            for v in pdf["ts"].dt.floor("ms").astype("datetime64[ms]").astype("int64")
        )
        closed = []
        cur = list(state.get) if state.exists else None
        for t in ts:
            if cur is None:
                cur = [t, t, 1]
            elif t <= cur[1] + gap_ms:
                cur[1] = max(cur[1], t)
                cur[2] += 1
            else:
                closed.append(tuple(cur))
                cur = [t, t, 1]
        state.update(tuple(cur))
        # the timeout must sit strictly above the current watermark or
        # Spark rejects it (an old straggler session re-arms at wm+1
        # and expires on the very next batch)
        state.setTimeoutTimestamp(
            max(cur[1] + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield frame(closed)

    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, session_start timestamp, "
                "session_end timestamp, n_events long"
            ),
            stateStructType="start long, end long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_click_purchase_joins(
    events: DataFrame,
    *,
    watermark: str = "1 hour",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: each click pairs with the same
    user's purchases landing within ``max_lag`` after it — the
    attribution join, as a watermarked streaming inner join.

    Scale posture: both sides declare watermarks and the join
    condition bounds purchase_ts relative to click_ts, so the state
    store retains each side only for watermark + lag and evicts
    continuously — the required shape for an unbounded 100 TB/day
    stream (an unconstrained stream-stream join would buffer forever).
    The join shuffles both sides on user_id; output is append-mode.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"""c_user = p_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + interval {max_lag}"""
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long"))
        .alias("lag_s"),
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


def stream_click_purchase_left_outer(
    events: DataFrame,
    *,
    watermark: str = "1 hour",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits —
    paired with in-window purchases when they exist, null-extended
    once the watermark PROVES no purchase can still arrive.

    The outer side is the semantics inner joins can't give a stream:
    "clicks that did NOT convert" requires evidence of absence, which
    only the watermark can certify. A click's null row emits when the
    global watermark passes click_ts + max_lag; clicks younger than
    that at stream end stay buffered (no emission) — the oracle
    models exactly that cutoff.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"""c_user = p_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + interval {max_lag}"""
        ),
        "leftOuter",
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
    )


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


def run_foreach_batch_upsert(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    checkpoint: str,
    *,
    order_by: Sequence[str] = ("ts",),
) -> None:
    """Continuously MERGE a stream into a keyed table: the standard
    ``foreachBatch`` CDC-apply pattern (streaming ingest feeding a
    maintained dimension/state table).

    Per micro-batch:
    1. collapse the batch to one row per key — LAST writer wins,
       ordered by ``order_by`` descending with the key as tiebreak
       (deterministic, unlike ``dropDuplicates``);
    2. ``merge_upsert`` it into the current table snapshot (one
       shuffle on the keys, or none when the batch broadcasts);
    3. rewrite the snapshot. ``localCheckpoint`` first: it cuts the
       lineage back to materialized blocks so the overwrite isn't
       reading the same path it's replacing.

    The checkpoint makes the whole thing exactly-once at the batch
    level: re-running against a drained source applies nothing.

    Scale posture: step 3 is the parquet stand-in for a transactional
    MERGE commit — on Delta/Iceberg the same ``_apply`` body calls the
    table's MERGE and steps 2-3 collapse into a metadata commit
    touching only matched files; the per-batch join cost is bounded by
    the batch size, not the table size, once the table is bucketed or
    clustered on the keys.
    """
    spark = stream.sparkSession
    key_list = list(keys)
    order_desc = [F.col(c).desc() for c in order_by] + [
        F.col(k).asc() for k in key_list
    ]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy(*key_list).orderBy(*order_desc)
        updates = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if os.path.isdir(target_path):
            from ..operators.upsert import merge_upsert

            merged = merge_upsert(
                spark.read.parquet(target_path), updates, key_list
            )
        else:
            merged = updates
        snap = tracked_local_checkpoint(merged, eager=True)
        snap.write.mode("overwrite").parquet(target_path)
        release_df(snap)  # blocks are dead once the snapshot is on disk

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
