"""Event-time-timeout sessionization across micro-batches.

Two checkpointed availableNow drains: sessions must close exactly when
the watermark passes last activity + gap — via the in-batch gap split
or the EventTimeTimeout firing — and each closed session is emitted
exactly once, never re-opened by later batches. This is the bounded-
state sessionizer a 100 TB stream needs: state is one open triple per
ACTIVE user, dropped by the engine on expiry (no scan, no growth).
"""

from __future__ import annotations

import shutil
import uuid
from datetime import datetime

from museum_image_etl_gridfs_spark.streaming.events import stream_expiring_sessions

_SCHEMA = "event_id long, ts timestamp, user_id long"


def _t(s):
    return datetime.fromisoformat(f"2024-01-01T{s}:00")


def _write(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).write.mode("append").parquet(path)


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(_SCHEMA).format("parquet").load(src)
    q = (
        stream_expiring_sessions(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    )


def test_sessions_close_on_watermark_not_before(spark):
    base = f"/root/repo/.tmp_sess_{uuid.uuid4().hex[:8]}"
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    try:
        # drain 1: user 1 has two in-batch sessions (gap split emits the
        # first immediately); the 13:00 event advances the watermark to
        # 12:30, timing out user 1's 11:30 tail and user 2's session
        _write(spark, src, [
            (1, _t("10:00"), 1),
            (2, _t("10:10"), 1),
            (3, _t("11:30"), 1),
            (4, _t("10:05"), 2),
            (5, _t("13:00"), 99),
        ])
        first = _drain(spark, src, out, ckpt)
        assert first == [
            (1, _t("10:00"), _t("10:10"), 2),
            (1, _t("11:30"), _t("11:30"), 1),
            (2, _t("10:05"), _t("10:05"), 1),
        ]

        # drain 2: user 1 returns at 13:30 (fresh session — the old one
        # closed and must NOT be extended); 15:30 pushes the watermark
        # to 15:00, expiring both user 99's and user 1's new session;
        # user 3's 15:30 stays open (watermark hasn't passed 16:00)
        _write(spark, src, [(6, _t("13:30"), 1), (7, _t("15:30"), 3)])
        final = _drain(spark, src, out, ckpt)
        assert final == [
            (1, _t("10:00"), _t("10:10"), 2),
            (1, _t("11:30"), _t("11:30"), 1),
            (1, _t("13:30"), _t("13:30"), 1),
            (2, _t("10:05"), _t("10:05"), 1),
            (99, _t("13:00"), _t("13:00"), 1),
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
