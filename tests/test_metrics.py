"""observe() metrics and quarantine split (A4 / §2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.operators.metrics import (
    quarantine_split,
    with_stage_metrics,
)


def test_observe_counts_during_job(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "k int, v string"
    )
    observed, obs = with_stage_metrics(df, "clean")
    assert observed.count() == 3
    got = obs.get
    assert got["n_rows"] == 3 and got["n_null_keys"] == 1


def test_quarantine_split(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, "error:ValueError"), (3, "ok")], "k int, status string"
    )
    good, bad = quarantine_split(df, "status")
    assert {r["k"] for r in good.collect()} == {1, 3}
    assert {r["k"] for r in bad.collect()} == {2}
