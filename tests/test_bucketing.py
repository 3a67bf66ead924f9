"""Bucketed co-located join: the join itself must not shuffle."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.bucketing import (
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    o, l = bucketed_tables
    joined = read_table(spark, o).join(read_table(spark, l), "o_orderkey")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert not re.findall(r"^\(\d+\) Exchange", plan, flags=re.M), plan


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    o, l = bucketed_tables
    bucketed = (
        read_table(spark, o)
        .join(read_table(spark, l), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    plain = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert bucketed.subtract(plain).count() == 0
    assert plain.subtract(bucketed).count() == 0
