"""Count-min-sketch heavy hitters (operators/sketches.py).

The operator's contract is EXACTNESS — the sketch only routes work —
so every test compares against a brute-force groupBy count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from museum_image_etl_gridfs_spark.operators.sketches import (
    cms_heavy_hitters,
    tokens_of,
)


def _exact(df, frac):
    import math

    rows = df.groupBy("item").agg(F.count(F.lit(1)).alias("freq")).collect()
    total = sum(r["freq"] for r in rows)
    thr = math.ceil(frac * total)
    return {(r["item"], r["freq"]) for r in rows if r["freq"] >= thr}


def _items_df(spark, counts: dict[str, int], n_parts: int):
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "item string").repartition(n_parts)


@pytest.mark.parametrize("frac", [0.05, 0.2, 0.5])
def test_matches_exact_counts(spark, frac):
    counts = {f"tok{i}": 5 * (i + 1) for i in range(20)}  # 5..100, total 1050
    df = _items_df(spark, counts, 4)
    got = {
        (r["item"], r["freq"])
        for r in cms_heavy_hitters(df, "item", frac).collect()
    }
    assert got == _exact(df, frac)


def test_exact_under_partition_skew(spark):
    # one giant skew key + a tail; single-partition and many-partition
    # layouts must agree (the candidate bar is skew-proof)
    counts = {"whale": 400, **{f"fish{i}": 3 for i in range(50)}}
    for n_parts in (1, 7):
        df = _items_df(spark, counts, n_parts)
        got = {
            (r["item"], r["freq"])
            for r in cms_heavy_hitters(df, "item", 0.1).collect()
        }
        assert got == {("whale", 400)}


def test_narrow_sketch_still_exact(spark):
    # width 8 forces heavy CMS collisions -> estimates overcount ->
    # extra candidates survive pruning, but the exact recount still
    # discards them: output unchanged
    counts = {f"t{i}": 10 + i for i in range(30)}
    df = _items_df(spark, counts, 4)
    got = {
        (r["item"], r["freq"])
        for r in cms_heavy_hitters(df, "item", 0.05, depth=2, width=8).collect()
    }
    assert got == _exact(df, 0.05)


def test_empty_and_null_inputs(spark):
    empty = spark.createDataFrame([], "item string")
    assert cms_heavy_hitters(empty, "item", 0.1).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "item string")
    assert cms_heavy_hitters(nulls, "item", 0.1).count() == 0


def test_tokens_of_matches_sql_split(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("  ",), (None,), ("a\tb\nc",)], "text string"
    )
    got = [r["toks"] for r in df.select(tokens_of("text").alias("toks")).collect()]
    assert got == [["hello", "world"], [], [], ["a", "b", "c"]]
