"""Custom Python DataSource (format('museum_api')) — hermetic."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.sources.museum_api import MuseumApiDataSource

CANNED = {
    "1": {"title": "Sunflowers", "artistDisplayName": "van Gogh"},
    "2": {"title": "Water Lilies", "artistDisplayName": "Monet"},
}


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(MuseumApiDataSource)


def _read(spark, ids: str, partitions: str = "2"):
    return (
        spark.read.format("museum_api")
        .option("ids", ids)
        .option("partitions", partitions)
        .option("canned_json", json.dumps(CANNED))
        .load()
    )


def test_reads_documents(spark):
    rows = {r["object_id"]: r for r in _read(spark, "1,2,3").collect()}
    assert rows[1]["status"] == 200 and "Sunflowers" in rows[1]["body"]
    assert rows[2]["status"] == 200
    assert rows[3]["status"] == 404 and rows[3]["body"] == ""


def test_partitioned_scan(spark):
    df = _read(spark, ",".join(str(i) for i in range(1, 11)), partitions="4")
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 10


def test_composes_with_relational_plan(spark):
    """The source is a regular scan: filters/projections/JSON parse
    compose on top like any table (the reference's loop steps become
    plan nodes)."""
    df = _read(spark, "1,2,3")
    parsed = (
        df.filter(F.col("status") == 200)
        .select(
            "object_id",
            F.get_json_object("body", "$.artistDisplayName").alias("artist"),
        )
        .orderBy("object_id")
    )
    assert [r["artist"] for r in parsed.collect()] == ["van Gogh", "Monet"]


def test_empty_ids(spark):
    assert _read(spark, "").count() == 0
