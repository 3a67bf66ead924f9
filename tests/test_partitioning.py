"""spread() must add an Exchange for under-split input and add NOTHING
for input that is already wide — the 100 TB posture pin for every
CPU-bound stage (sketching, scoring, codecs).

VERDICT r1 flagged unconditional ``repartition(defaultParallelism,
key)`` barriers: right on single-row-group fixtures, wrong at scale
(full-corpus shuffle + partition-count collapse). This test builds a
multi-partition input and asserts the barrier is gone, and a
1-partition input and asserts it appears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.dedup import (
    minhash_near_duplicates,
)
from museum_image_etl_gridfs_spark.partitioning import spread


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spread_repartitions_narrow_input(spark):
    df = spark.range(100).coalesce(1)
    out = spread(df, "id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert "Exchange hashpartitioning" in _physical(out)


def test_spread_is_identity_on_wide_input(spark):
    wide = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism * 2, "id"
    )
    # materialize the repartitioned shape as the "scan" stand-in
    assert wide.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    out = spread(wide, "id")
    assert out is wide  # no extra node at all


def test_spread_explicit_target(spark):
    df = spark.range(10).coalesce(1)
    assert spread(df, "id", target=7).rdd.getNumPartitions() == 7


def test_minhash_has_no_barrier_on_presplit_input(spark, sf_dir, tmp_path):
    """End-to-end posture pin: write the documents fixture as many
    small files (the multi-row-group / many-split scan shape of a
    large table), and assert the minhash plan contains NO
    hashpartitioning Exchange on the raw text — the sketch stage must
    inherit the scan's splits."""
    n_target = spark.sparkContext.defaultParallelism
    src = load(spark, "documents", sf_dir).select("doc_id", "text")
    path = str(tmp_path / "docs_many_files")
    src.repartition(n_target, "doc_id").write.mode("overwrite").parquet(path)

    docs = spark.read.parquet(path)
    assert docs.rdd.getNumPartitions() >= n_target

    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", k=5, num_hashes=32, bands=8, min_jaccard=0.4
    )
    plan = _physical(pairs)
    # exactly ONE repartition exchange — the deliberate (band,
    # band_hash) bucket barrier; the fp-collapse window, the blocking
    # windows and the block-task groupBy all reuse it (superset keys).
    # No up-front repartition of (id, text): the sketch MapInPandas
    # sits directly on the FileScan, and it appears exactly ONCE (the
    # exact-dup star branch must not fork/re-run the sketch).
    assert plan.count("REPARTITION_BY_COL") == 1
    assert plan.count("MapInArrow fn(") == 1
    # remaining exchanges are all narrow: the (fp, id) star aggregate
    # + its join side, and the final pair dedup
    assert plan.count("Exchange hashpartitioning") <= 4

    # and on the single-file fixture the spread barrier IS present
    # (spread passes an explicit partition count -> REPARTITION_BY_NUM;
    # it shows once per branch of the star-pair fork)
    one = load(spark, "documents", sf_dir).select("doc_id", "text").coalesce(1)
    plan_one = _physical(
        minhash_near_duplicates(
            one, "doc_id", "text", k=5, num_hashes=32, bands=8, min_jaccard=0.4
        )
    )
    assert plan_one.count("REPARTITION_BY_NUM") >= 1
    assert plan_one.count("REPARTITION_BY_COL") == 1
