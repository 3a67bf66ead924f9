"""MERGE-style upsert semantics (S8 distributed form)."""

from __future__ import annotations

import pytest

from museum_image_etl_gridfs_spark.operators.upsert import merge_upsert


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, name string, score int",
    )


def test_update_insert_keep(spark):
    updates = spark.createDataFrame(
        [(2, 99), (4, 40)], "id long, score int"
    )
    got = {r["id"]: r for r in merge_upsert(_target(spark), updates, ["id"]).collect()}
    assert got[1]["score"] == 10 and got[1]["name"] == "a"   # kept
    assert got[2]["score"] == 99 and got[2]["name"] == "b"   # updated, other col kept
    assert got[3]["score"] == 30                              # kept
    assert got[4]["score"] == 40 and got[4]["name"] is None   # inserted
    assert len(got) == 4


def test_set_to_null_is_an_update(spark):
    updates = spark.createDataFrame([(1, None)], "id long, score int")
    got = {r["id"]: r for r in merge_upsert(_target(spark), updates, ["id"]).collect()}
    assert got[1]["score"] is None  # explicit NULL wins over target


def test_no_insert_mode(spark):
    updates = spark.createDataFrame([(2, 99), (4, 40)], "id long, score int")
    got = merge_upsert(_target(spark), updates, ["id"], insert_missing=False)
    ids = {r["id"] for r in got.collect()}
    assert ids == {1, 2, 3}


def test_unknown_update_column_raises(spark):
    updates = spark.createDataFrame([(1, 5)], "id long, nope int")
    with pytest.raises(ValueError, match="nope"):
        merge_upsert(_target(spark), updates, ["id"])


def test_idempotent(spark):
    updates = spark.createDataFrame([(2, 99), (4, 40)], "id long, score int")
    once = merge_upsert(_target(spark), updates, ["id"])
    twice = merge_upsert(once, updates, ["id"])
    assert once.subtract(twice).count() == 0
    assert twice.subtract(once).count() == 0
