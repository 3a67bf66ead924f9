"""Structured Streaming operators (SURVEY.md §2.9 / §7 extension).

The reference is batch-only; its single incremental gesture is the
"skip already-transformed rows" filter (src/transform_load.py:83-84).
This package supplies the real streaming surface a 100 TB ingest
pipeline needs: event-time windows with watermarks, late-data drop,
streaming dedup, and a custom stateful operator — each the streaming
face of a batch query in plans/queries_events.py, with
``availableNow`` batch-equivalence asserted in tests/test_streaming.py.
"""

from .events import (  # noqa: F401
    events_stream,
    stream_click_purchase_joins,
    run_foreach_batch_upsert,
    run_to_memory,
    run_to_parquet,
    stream_dedup_within_watermark,
    stream_enriched_segment_counts,
    stream_expiring_sessions,
    stream_hourly_ohlc_bars,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
    stream_user_running_totals,
)
