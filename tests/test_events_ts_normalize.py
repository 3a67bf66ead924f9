"""Pin `catalog.normalize_events_ts` against every physical layout the
driver's ``events.parquet`` has shipped: TIMESTAMP(NANOS) (round 1,
readable only as raw int64 via ``nanosAsLong``) and TIMESTAMP(MICROS)
with ``isAdjustedToUTC=false`` (round 2+, surfaces as TIMESTAMP_NTZ).
Both must normalize to an identical session-tz TIMESTAMP — the round-2
fixture drift silently collapsed the streaming timeline to ~1970 and
broke four queries, so this is a permanent regression gate."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from museum_image_etl_gridfs_spark.catalog import normalize_events_ts

_INSTANTS = [
    datetime.datetime(2024, 3, 1, 12, 0, 0),
    datetime.datetime(2024, 3, 1, 12, 59, 59, 999999),
    datetime.datetime(2024, 3, 2, 0, 0, 0, 1),
]


def _write(tmpdir: str, unit: str) -> str:
    micros = [_us(dt) for dt in _INSTANTS]
    if unit == "ns":
        arr = pa.array([m * 1000 for m in micros], type=pa.timestamp("ns"))
    else:
        arr = pa.array(micros, type=pa.timestamp("us"))
    t = pa.table({"event_id": pa.array([1, 2, 3], type=pa.int64()), "ts": arr})
    path = f"{tmpdir}/events_{unit}.parquet"
    pq.write_table(t, path)
    return path


def _us(dt: datetime.datetime) -> int:
    epoch = datetime.datetime(1970, 1, 1)
    return int((dt - epoch) / datetime.timedelta(microseconds=1))


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_normalize_both_physical_layouts(spark, tmp_path, unit):
    path = _write(str(tmp_path), unit)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = normalize_events_ts(spark.read.parquet(path))
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == _INSTANTS, unit


def test_nanos_truncation_matches_duckdb(spark, tmp_path):
    """ns→µs must truncate (long division), matching DuckDB's cast —
    the .9995 µs round-up through a double was a round-1 bug."""
    arr = pa.array([1700000000_123456999], type=pa.timestamp("ns"))
    t = pa.table({"event_id": pa.array([1], type=pa.int64()), "ts": arr})
    path = f"{tmp_path}/events_edge.parquet"
    pq.write_table(t, path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = normalize_events_ts(spark.read.parquet(path))
    got = df.collect()[0].ts
    epoch = datetime.datetime(1970, 1, 1)
    assert got == epoch + datetime.timedelta(microseconds=1700000000_123456)
