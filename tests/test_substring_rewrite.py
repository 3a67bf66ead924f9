"""substring_dedup_rewrite (operators/spans.py): Lee et al. ACL'22
ExactSubstr semantics — every corpus-duplicated >= k-token span is cut
except the gram's globally FIRST occurrence; rewritten text must be
reconstructable and deterministic."""

from __future__ import annotations

from museum_image_etl_gridfs_spark.operators.spans import (
    substring_dedup_rewrite,
)


def _run(spark, texts, k=3):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = substring_dedup_rewrite(df, k=k)
    return {
        r["doc_id"]: (r["orig_tokens"], r["removed_tokens"], r["kept_text"])
        for r in out.collect()
    }


def test_first_occurrence_kept_later_cut(spark):
    # doc 0 and doc 1 share the 3-gram "p q r"; doc 0 (lower id) keeps
    # it, doc 1 loses exactly those 3 tokens
    got = _run(spark, ["p q r s t", "a b p q r"], k=3)
    assert got[0] == (5, 0, "p q r s t")
    # removal gram starts at pos 3; island covers tokens 3..5
    assert got[1] == (5, 3, "a b")


def test_within_doc_repeat_cut_once(spark):
    # "x y z w x y z": 3-gram "x y z" occurs twice IN the doc; the
    # first stays, the second (pos 5..7) is cut
    got = _run(spark, ["x y z w x y z"], k=3)
    assert got[0] == (7, 3, "x y z w")


def test_overlapping_removals_merge_into_one_span(spark):
    # doc 1 repeats doc 0's full 4 tokens: grams at pos 1 and 2 both
    # removal-marked, islands merge -> the whole doc is cut
    got = _run(spark, ["m n o p", "m n o p"], k=3)
    assert got[0] == (4, 0, "m n o p")
    assert got[1] == (4, 4, "")


def test_no_duplicates_untouched_and_normalized(spark):
    got = _run(spark, ["A  B c", "d e f"], k=3)
    assert got[0] == (3, 0, "a b c")
    assert got[1] == (3, 0, "d e f")


def test_short_docs_pass_through(spark):
    got = _run(spark, ["a b", "a b"], k=3)  # shorter than k: no grams
    assert got[0] == (2, 0, "a b")
    assert got[1] == (2, 0, "a b")


def test_rewrite_consistent_with_duplicated_spans(spark, sf_dir):
    """On the real fixture: removed_tokens must be <= the doc's
    duplicated-token mass from duplicated_spans (the rewrite keeps
    first occurrences, so it removes a subset of the flagged mass),
    and docs without spans must be untouched."""
    from museum_image_etl_gridfs_spark.catalog import load
    from museum_image_etl_gridfs_spark.operators.spans import (
        duplicated_spans,
    )
    from pyspark.sql import functions as F

    docs = load(spark, "documents", sf_dir)
    rew = substring_dedup_rewrite(docs, k=5)
    spans = (
        duplicated_spans(docs, k=5)
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("span_end") - F.col("span_start") + 1
            ).alias("dup_tokens")
        )
    )
    joined = rew.join(spans, "doc_id", "left").select(
        "doc_id",
        "removed_tokens",
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
    )
    bad = joined.filter(
        (F.col("removed_tokens") > F.col("dup_tokens"))
        | ((F.col("dup_tokens") == 0) & (F.col("removed_tokens") > 0))
    )
    assert bad.count() == 0
    # the fixture has duplicated spans, so the rewrite must bite
    assert joined.filter(F.col("removed_tokens") > 0).count() > 0
