"""As-of join, range join, salted aggregation, approx-distinct."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.joins import asof_join, range_join
from museum_image_etl_gridfs_spark.operators.skew import salted_aggregate


def _ts(s):
    return datetime.fromisoformat(s)


def _quotes(spark):
    # (key, time, price) — the classic as-of build side
    rows = [
        ("A", _ts("2024-01-01T10:00:00"), 100.0),
        ("A", _ts("2024-01-01T11:00:00"), 110.0),
        ("A", _ts("2024-01-01T12:00:00"), 120.0),
        ("B", _ts("2024-01-01T10:30:00"), 50.0),
    ]
    return spark.createDataFrame(rows, "k string, t timestamp, price double")


def _trades(spark):
    rows = [
        (1, "A", _ts("2024-01-01T09:59:59")),  # before any quote
        (2, "A", _ts("2024-01-01T10:00:00")),  # exactly at a quote
        (3, "A", _ts("2024-01-01T11:30:00")),  # between quotes
        (4, "A", _ts("2024-01-01T13:00:00")),  # after all quotes
        (5, "B", _ts("2024-01-01T10:31:00")),
        (6, "C", _ts("2024-01-01T10:00:00")),  # key with no quotes
    ]
    return spark.createDataFrame(rows, "id long, k string, t timestamp")


def test_asof_inclusive(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on=["k"], left_time="t", right_time="t",
        right_values=["price"], strict=False,
    )
    got = {r["id"]: r["price"] for r in out.collect()}
    assert got == {1: None, 2: 100.0, 3: 110.0, 4: 120.0, 5: 50.0, 6: None}


def test_asof_strict(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on=["k"], left_time="t", right_time="t",
        right_values=["price"], strict=True,
    )
    got = {r["id"]: r["price"] for r in out.collect()}
    # id=2 at exactly 10:00 must NOT see the 10:00 quote
    assert got == {1: None, 2: None, 3: 110.0, 4: 120.0, 5: 50.0, 6: None}


def test_asof_tolerance(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on=["k"], left_time="t", right_time="t",
        right_values=["price"], strict=False, tolerance_seconds=1800,
    )
    got = {r["id"]: r["price"] for r in out.collect()}
    # id=4 (13:00) is 60 min after the last quote -> outside horizon
    assert got[4] is None
    assert got[3] == 110.0  # 30 min gap, inside


def test_asof_preserves_left_rowcount(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on=["k"], left_time="t", right_time="t",
        right_values=["price"], strict=False,
    )
    assert out.count() == _trades(spark).count()


def test_range_join_tiers(spark):
    probe = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 24), (4, 25), (5, 99)], "id long, v int"
    )
    bounds = spark.createDataFrame(
        [("low", 0, 10), ("mid", 10, 25), ("high", 25, 60)],
        "tier string, lo int, hi int",
    )
    got = {
        r["id"]: r["tier"]
        for r in range_join(probe, bounds, "v", "lo", "hi").collect()
    }
    # half-open [lo, hi): 10 -> mid, 25 -> high, 99 -> no tier (left join)
    assert got == {1: "low", 2: "mid", 3: "mid", 4: "high", 5: None}


def test_salted_aggregate_matches_plain(spark, sf_dir):
    o = load(spark, "orders", sf_dir).withColumn(
        "__tp", F.col("o_totalprice").cast("decimal(18,2)")
    )
    salted = salted_aggregate(
        o, ["o_orderpriority"], count_alias="n",
        sum_cols={"__tp": "s"}, n_salts=8,
    )
    plain = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__tp").alias("s")
    )
    assert salted.subtract(plain).count() == 0
    assert plain.subtract(salted).count() == 0


def test_approx_distinct_within_5pct(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
        F.countDistinct("l_partkey").alias("e"),
    ).collect()[0]
    assert abs(row["a"] - row["e"]) / row["e"] < 0.05


def test_asof_null_field_carried_atomically(spark):
    """A NULL field on the MATCHED right row must stay NULL — the
    struct carry forbids inheriting that field from an older row
    (regression: per-column last(ignorenulls) mixed rows)."""
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T12:00:00"))], "id long, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 100.0, "old"),
            ("A", _ts("2024-01-01T11:00:00"), None, "new"),
        ],
        "k string, t timestamp, price double, tag string",
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        right_values=["price", "tag"], strict=False,
    ).collect()[0]
    assert out["tag"] == "new" and out["price"] is None
