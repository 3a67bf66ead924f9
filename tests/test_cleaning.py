"""F5 — NA standardization three-way semantics (SURVEY.md §2.2).

The reference's cleaning treats NULL, "", and missing-key alike
(src/transform_load.py:29-31); ``na_standardize`` must map NULL and
"" to "NA" and leave every other value — including whitespace-only
strings, "0", and "None" — untouched.
"""

from __future__ import annotations

import pytest

from museum_image_etl_gridfs_spark.functions.cleaning import (
    NA_SENTINEL,
    na_standardize,
)


def _rows(spark, values):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, artist string"
    )


def test_null_and_empty_become_na(spark):
    df = na_standardize(_rows(spark, [None, "", "Monet"]), ["artist"])
    got = {r["id"]: r["artist"] for r in df.collect()}
    assert got == {0: NA_SENTINEL, 1: NA_SENTINEL, 2: "Monet"}


def test_falsy_lookalikes_are_preserved(spark):
    # only NULL and "" are falsy for strings; these must pass through
    values = [" ", "0", "None", "NA", "null", "\t"]
    df = na_standardize(_rows(spark, values), ["artist"])
    got = [r["artist"] for r in df.sort("id").collect()]
    assert got == values


def test_only_requested_columns_touched(spark):
    df = spark.createDataFrame(
        [(1, None, None)], "id int, artist string, medium string"
    )
    out = na_standardize(df, ["artist"]).collect()[0]
    assert out["artist"] == NA_SENTINEL
    assert out["medium"] is None


def test_column_order_preserved(spark):
    df = spark.createDataFrame([(1, "x", "y")], "a int, b string, c string")
    assert na_standardize(df, ["b", "c"]).columns == ["a", "b", "c"]


def test_unknown_column_raises(spark):
    df = _rows(spark, ["x"])
    with pytest.raises(ValueError, match="nope"):
        na_standardize(df, ["nope"])


def test_custom_sentinel(spark):
    df = na_standardize(_rows(spark, [None]), ["artist"], sentinel="??")
    assert df.collect()[0]["artist"] == "??"


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    values=st.lists(
        st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=20
    )
)
def test_na_standardize_property(spark, values):
    """Property: output == 'NA' exactly when input is NULL or '';
    everything else passes through verbatim (three-way semantics)."""
    got = [
        r["artist"]
        for r in na_standardize(_rows(spark, values), ["artist"]).sort("id").collect()
    ]
    want = [NA_SENTINEL if v is None or v == "" else v for v in values]
    assert got == want
