"""Snapshot-diff operator semantics (operators/diff.py).

Pins the full-outer classification — including the Spark USING-join
coalescing pitfall (NOTES.md): a naive ``b["key"].isNull()`` after a
``join(b, "key", "full_outer")`` stops detecting removed rows.
"""

from __future__ import annotations

from museum_image_etl_gridfs_spark.operators.diff import snapshot_diff_frames


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_classifies_added_removed_changed_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], ["k", "v"]
    )
    got = snapshot_diff_frames(old, new, "k", ["v"])
    assert set(got.columns) == {"k", "change_type", "old_v", "new_v"}
    assert _rows(got) == {
        (2, "changed", "b", "B"),
        (3, "removed", "c", None),
        (4, "added", None, "d"),
    }


def test_null_safe_compare_flags_null_transitions(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x"), (2, None)], "k long, v string")
    got = snapshot_diff_frames(old, new, "k", ["v"])
    # NULL -> 'x' is a change; NULL -> NULL is not (eqNullSafe compare)
    assert _rows(got) == {(1, "changed", None, "x")}


def test_multi_column_tracking_any_difference_counts(spark):
    old = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], ["k", "v", "w"])
    new = spark.createDataFrame([(1, "a", 11), (2, "b", 20)], ["k", "v", "w"])
    got = snapshot_diff_frames(old, new, "k", ["v", "w"])
    # column order: key, change_type, old_* columns, then new_* columns
    assert _rows(got) == {(1, "changed", "a", 10, "a", 11)}


def test_null_key_classified_by_presence_not_key_nullness(spark):
    old = spark.createDataFrame([(None, "x")], "k long, v string")
    new = spark.createDataFrame([], "k long, v string")
    got = snapshot_diff_frames(old, new, "k", ["v"]).collect()
    assert len(got) == 1
    assert got[0]["change_type"] == "removed" and got[0]["old_v"] == "x"
    # and NULL keys on both sides pair up like an ordinary key value
    new2 = spark.createDataFrame([(None, "y")], "k long, v string")
    got2 = snapshot_diff_frames(old, new2, "k", ["v"]).collect()
    assert [r["change_type"] for r in got2] == ["changed"]


def test_empty_tracked_is_key_only_diff(spark):
    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {
        (r["k"], r["change_type"])
        for r in snapshot_diff_frames(old, new, "k", []).collect()
    }
    assert got == {(1, "removed"), (3, "added")}
