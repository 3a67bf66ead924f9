"""Runtime filtering contracts: bloom-pruned joins and DPP.

These pin the two scan-reduction mechanisms the 100 TB posture leans
on (operators/pruning.py): a selective dim filter must turn into a
``might_contain`` on the fact scan (bloom) and, over a partitioned
layout, into a ``dynamicpruningexpression`` partition filter (DPP) —
and neither may change results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.pruning import (
    bloom_join_confs,
    runtime_filter_report,
    session_confs,
    write_partitioned,
)


def _bloom_query(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


def test_bloom_filter_injected_and_result_unchanged(spark, sf_dir):
    baseline = {tuple(r) for r in _bloom_query(spark, sf_dir).collect()}

    confs = bloom_join_confs(application_side_scan_threshold="0")
    confs["spark.sql.autoBroadcastJoinThreshold"] = "-1"  # force shuffle join
    with session_confs(spark, **confs):
        df = _bloom_query(spark, sf_dir)
        report = runtime_filter_report(df)
        assert report["bloom"], "bloom filter not injected into fact scan"
        assert {tuple(r) for r in df.collect()} == baseline


def test_bloom_not_injected_at_default_thresholds(spark, sf_dir):
    # At the cluster-real 10GB application-side threshold the fixture
    # scan is far too small — injection must NOT happen (the filter
    # costs an extra aggregation; below threshold it's a net loss).
    with session_confs(
        spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}
    ):
        assert not runtime_filter_report(_bloom_query(spark, sf_dir))["bloom"]


def test_dpp_prunes_partitioned_fact(spark, sf_dir, tmp_path):
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)
    path = str(tmp_path / "fact_by_priority")
    write_partitioned(fact, path, ["o_orderpriority"])

    pf = spark.read.parquet(path)
    # The dim must be a stats-bearing relation (a table, as at real
    # scale) — an in-memory ExistingRDD has no size estimate, so
    # Catalyst's pruning-benefit check rejects DPP.
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 2), ("5-LOW", 3)],
        "prio string, rank int",
    ).write.parquet(dim_path)
    # The dim filter must be a shape Catalyst deems "likely selective"
    # (equality / IN / LIKE) — a bare boolean column is not, and DPP
    # silently skips.
    dim = spark.read.parquet(dim_path).filter(F.col("rank") == 1)
    # DPP (reuseBroadcastOnly default) needs the DIM side broadcast; at
    # fixture scale the fact is small enough that Spark may pick it as
    # the build side instead — hint the dim, as a real job would.
    joined = pf.join(F.broadcast(dim), pf.o_orderpriority == dim.prio)

    assert runtime_filter_report(joined)["dpp"], "no dynamic partition pruning"
    static = pf.filter(F.col("o_orderpriority") == "1-URGENT")
    assert joined.count() == static.count()


def test_session_confs_restores_prior_values(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key)
    with session_confs(spark, **{key: "-1"}):
        assert spark.conf.get(key) == "-1"
    assert spark.conf.get(key) == before

    # a key with no prior value is unset again on exit
    novel = "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems"
    had_prior = True
    try:
        prior = spark.conf.get(novel)
    except Exception:
        had_prior = False
    with session_confs(spark, **{novel: "12345"}):
        assert spark.conf.get(novel) == "12345"
    if had_prior:
        assert spark.conf.get(novel) == prior
    else:
        with pytest.raises(Exception):
            spark.conf.get(novel)
