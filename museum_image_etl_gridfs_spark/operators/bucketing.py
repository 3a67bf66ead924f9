"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant recurring cost of a fact-to-fact join is the
shuffle. Writing both tables bucketed by the join key (same bucket
count) makes every subsequent join between them shuffle-free: each
task reads matching buckets from both sides and joins locally. This
module wraps the write/read pair and is exercised by a plan test
asserting the join has NO Exchange.

The reference has no storage layout at all (Mongo collections,
per-row I/O); this is the Spark-native answer to "the same join runs
every night" (SURVEY.md §4 manual-optimization gap).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    Sorting within buckets additionally enables merge-join without a
    per-task sort. Bucket counts must match on both sides of a
    co-located join.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
