"""Distributed skyline operator (operators/skyline.py): parity with a
brute-force dominance filter, tie semantics, partition invariance."""

from __future__ import annotations

import random

import pytest

from museum_image_etl_gridfs_spark.operators.skyline import skyline


def _brute(rows, min_idx, max_idx):
    def dominates(a, b):
        le = all(a[i] <= b[i] for i in min_idx) and all(
            a[i] >= b[i] for i in max_idx
        )
        strict = any(a[i] < b[i] for i in min_idx) or any(
            a[i] > b[i] for i in max_idx
        )
        return le and strict

    return {
        r for r in rows if not any(dominates(o, r) for o in rows if o is not r)
    }


def test_matches_brute_force_random(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 20), rng.randint(0, 20)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, cost long, cap long").repartition(5)
    got = {
        (r["id"], r["cost"], r["cap"])
        for r in skyline(df, minimize=["cost"], maximize=["cap"]).collect()
    }
    want = _brute(rows, min_idx=[1], max_idx=[2])
    # brute keeps duplicates of frontier points too — compare as sets of rows
    assert got == want


def test_full_ties_both_survive(spark):
    rows = [(1, 5, 5), (2, 5, 5), (3, 9, 1)]
    df = spark.createDataFrame(rows, "id long, cost long, cap long")
    got = {r["id"] for r in skyline(df, minimize=["cost"], maximize=["cap"]).collect()}
    assert got == {1, 2}


def test_three_criteria(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.randint(0, 8), rng.randint(0, 8), rng.randint(0, 8))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long").repartition(3)
    got = {
        tuple(r)
        for r in skyline(df, minimize=["a", "b"], maximize=["c"]).collect()
    }
    assert got == _brute(rows, min_idx=[1, 2], max_idx=[3])


def test_partition_invariance(spark):
    rng = random.Random(3)
    rows = [(i, rng.randint(0, 50), rng.randint(0, 50)) for i in range(400)]
    outs = []
    for n_parts in (1, 4, 13):
        df = spark.createDataFrame(rows, "id long, x long, y long").repartition(
            n_parts
        )
        outs.append(
            frozenset(
                tuple(r) for r in skyline(df, minimize=["x", "y"]).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_nulls_excluded_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None, 5), (2, 3, 4)], "id long, cost long, cap long"
    )
    got = {r["id"] for r in skyline(df, minimize=["cost"], maximize=["cap"]).collect()}
    assert got == {2}
    empty = spark.createDataFrame([], "id long, cost long, cap long")
    assert skyline(empty, minimize=["cost"]).count() == 0


def test_requires_criteria(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        skyline(df)


def test_float_rounding_sum_tie_dominance(spark):
    """sum(a) < sum(b) can ROUND equal in float64 (1e16 + 1.0 == 1e16);
    the dominated row must still be evicted even when it is scanned
    first (SFS ordering is only a heuristic, not a correctness crutch)."""
    rows = [(1, 1.0e16, 1.0), (2, 1.0e16, 0.0)]  # 2 dominates 1
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r["id"] for r in skyline(df, minimize=["x", "y"]).collect()}
    assert got == {2}
