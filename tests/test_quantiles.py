"""ntile_exact (operators/quantiles.py) must reproduce Spark's own
ntile() over the same total order — on uniform, skewed, tied, and
remainder-heavy inputs — without ever planning a global window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.operators.quantiles import (
    global_row_number,
    ntile_exact,
    running_totals,
)


def _reference(df, keys, k):
    w = Window.orderBy(*keys)  # fine at test scale
    return df.withColumn("bucket", F.ntile(k).over(w))


def _assert_matches(df, keys, k):
    got = ntile_exact(df, keys, k).select(*keys, "bucket")
    want = _reference(df, keys, k).select(*keys, "bucket")
    assert got.subtract(want).count() == 0
    assert want.subtract(got).count() == 0


@pytest.mark.parametrize("k", [3, 7, 10])
def test_uniform_values_match_spark_ntile(spark, k):
    rows = [(float(i % 97), i) for i in range(500)]
    df = spark.createDataFrame(rows, "v double, id long").repartition(8)
    _assert_matches(df, ["v", "id"], k)


def test_heavy_value_skew_matches(spark):
    # 80% of rows share one hot value -> one wide width_bucket range
    rows = [(1.0 if i % 5 else float(i), i) for i in range(400)]
    df = spark.createDataFrame(rows, "v double, id long").repartition(8)
    _assert_matches(df, ["v", "id"], 10)


def test_remainder_distribution_first_buckets_bigger(spark):
    rows = [(float(i), i) for i in range(23)]  # 23 = 2*10 + 3
    df = spark.createDataFrame(rows, "v double, id long")
    sizes = (
        ntile_exact(df, ["v", "id"], 10)
        .groupBy("bucket").count().orderBy("bucket").collect()
    )
    assert [r["count"] for r in sizes] == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]


def test_constant_column_degenerates_gracefully(spark):
    rows = [(5.0, i) for i in range(30)]
    df = spark.createDataFrame(rows, "v double, id long").repartition(4)
    _assert_matches(df, ["v", "id"], 10)


def test_no_single_task_window_in_plan(spark):
    rows = [(float(i), i) for i in range(100)]
    df = spark.createDataFrame(rows, "v double, id long").repartition(4)
    out = ntile_exact(df, ["v", "id"], 10)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # a global (unpartitioned) window would plan Exchange SinglePartition
    assert "SinglePartition" not in plan


def test_null_lead_key_rejected(spark):
    rows = [(None, 1), (2.0, 2), (3.0, 3)]
    df = spark.createDataFrame(rows, "v double, id long")
    with pytest.raises(ValueError, match="NULL values in lead key"):
        ntile_exact(df, ["v", "id"], 2)


def test_property_random_data_matches_spark_ntile(spark):
    """Hypothesis-style randomized check (fixed seeds, no Spark-in-
    hypothesis overhead): any value distribution + any k must match
    Spark's ntile exactly."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(1, 300)
        k = rng.randint(2, 12)
        dup_pool = [rng.uniform(-1e6, 1e6) for _ in range(max(n // 10, 1))]
        rows = [
            (rng.choice(dup_pool) if rng.random() < 0.5
             else rng.uniform(-1e6, 1e6), i)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "v double, id long").repartition(5)
        _assert_matches(df, ["v", "id"], k)


def test_nan_lead_key_rejected(spark):
    """width_bucket(NaN) -> NULL pid would silently DROP rows through
    the offsets inner join; refuse NaN like NULL instead."""
    import pytest

    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 3.0)], "id long, x double"
    )
    with pytest.raises(ValueError, match="NaN"):
        ntile_exact(df, ["x", "id"], 2, out_col="b").collect()


# ---- global_row_number / running_totals (shared machinery) ----


def test_global_row_number_matches_spark_window(spark):
    rows = [(float(i % 53), i) for i in range(400)]
    df = spark.createDataFrame(rows, "v double, id long").repartition(8)
    got = global_row_number(df, ["v", "id"], out_col="rn")
    want = df.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")))
    assert got.select("v", "id", "rn").subtract(want.select("v", "id", "rn")).count() == 0
    assert want.select("v", "id", "rn").subtract(got.select("v", "id", "rn")).count() == 0


def test_global_row_number_no_single_partition_exchange(spark):
    rows = [(float(i), i) for i in range(100)]
    df = spark.createDataFrame(rows, "v double, id long").repartition(4)
    out = global_row_number(df, ["v", "id"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan


def test_running_totals_matches_global_window(spark):
    import random

    rng = random.Random(7)
    rows = [(float(rng.randint(0, 40)), i, rng.randint(1, 9), rng.randint(0, 5))
            for i in range(300)]
    df = spark.createDataFrame(rows, "v double, id long, a long, b long")
    df = df.repartition(6)
    got = running_totals(df, ["v", "id"], ["a", "b"])
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum_a", F.sum("a").over(w)).withColumn(
        "cum_b", F.sum("b").over(w)
    )
    cols = ["v", "id", "cum_a", "cum_b"]
    assert got.select(*cols).subtract(want.select(*cols)).count() == 0
    assert want.select(*cols).subtract(got.select(*cols)).count() == 0


def test_running_totals_decimal_values_exact(spark):
    rows = [(float(i % 11), i, f"{i}.25") for i in range(50)]
    df = spark.createDataFrame(rows, "v double, id long, m string")
    df = df.select("v", "id", F.col("m").cast("decimal(10,2)").alias("m"))
    got = running_totals(df, ["v", "id"], ["m"])
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum_m", F.sum("m").over(w))
    a = {(r["id"]): r["cum_m"] for r in got.collect()}
    b = {(r["id"]): r["cum_m"] for r in want.collect()}
    assert a == b


def test_running_totals_empty_input(spark):
    df = spark.createDataFrame([], "v double, id long, a long")
    out = running_totals(df, ["v", "id"], ["a"])
    assert out.count() == 0
    assert "cum_a" in out.columns


def test_running_totals_rejects_partial_nulls(spark):
    """ADVICE r3: a value column with SOME NULLs used to pass the
    bucket-sum NULL check but yield NULL running totals for rows
    before a bucket's first non-NULL — refuse loudly instead."""
    import pytest

    df = spark.createDataFrame(
        [(i, None if i == 7 else i * 10) for i in range(20)],
        "id long, a long",
    )
    with pytest.raises(ValueError, match="NULL values in 'a'"):
        running_totals(df, ["id"], ["a"]).collect()
