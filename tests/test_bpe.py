"""BPE merge learning (operators/bpe.py): hand-computed merge
sequences, determinism, early stop, and the end-of-word sentinel."""

from __future__ import annotations

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.bpe import (
    learn_bpe_merges,
    word_counts,
)


def test_word_counts(spark):
    docs = spark.createDataFrame(
        [("aa aa ab",), ("AA  b",), (None,)], ["text"]
    )
    got = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert got == {"aa": 3, "ab": 1, "b": 1}


def test_hand_computed_merge_sequence(spark):
    # words: aa x3, ab x1. symbols: [a,a,</w>] x3, [a,b,</w>].
    # pair counts: (a,a)=3, (a,</w>)=3, (a,b)=1, (b,</w>)=1.
    # tie at 3 -> lexicographic: ("a","</w>") < ("a","a").
    # merge 1: a+</w> -> a</w>; then (a, a</w>)=3 wins; after that
    # every remaining pair is weight 1 -> early stop at 2 merges.
    docs = spark.createDataFrame([("aa aa aa ab",)], ["text"])
    merges = learn_bpe_merges(docs, n_merges=8)
    assert merges == [(0, "a", "</w>", 3), (1, "a", "a</w>", 3)]


def test_merges_cannot_cross_word_boundaries(spark):
    # "ab" and "ba" adjacent as words must NOT produce a merge of
    # b+a spanning the boundary: the </w> sentinel separates them.
    docs = spark.createDataFrame([("ab ab ba ba",)], ["text"])
    merges = learn_bpe_merges(docs, n_merges=8)
    assert ("b", "a") not in {(m[1], m[2]) for m in merges} or all(
        m[2] != "a" or m[1] != "b" for m in merges
    )
    # first merges operate inside words (with or without sentinel)
    assert merges, "two repeated words must yield at least one merge"


def test_learn_is_deterministic_on_fixture(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    a = learn_bpe_merges(docs, n_merges=4)
    b = learn_bpe_merges(docs, n_merges=4)
    assert a == b
    assert len(a) == 4  # fixture vocabulary supports >= 4 merges
    assert all(c >= 2 for _, _, _, c in a)


def test_registry_query_shape(spark, sf_dir):
    from museum_image_etl_gridfs_spark.plans import all_queries

    df = all_queries()["bpe_learn_merges"].build(spark, sf_dir)
    rows = df.collect()
    assert [r["step"] for r in rows] == list(range(len(rows)))
    assert rows, "fixture corpus must produce merges"
