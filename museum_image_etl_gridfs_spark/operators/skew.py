"""Skew-aware aggregation (100 TB posture, SURVEY.md §4).

AQE's skew handling covers joins and post-shuffle partition
splitting, but a pathological hot GROUP BY key (the classic
empty-string / null-bucket problem in web-scale data) still funnels
one reducer. Salting splits each key into ``n_salts`` sub-keys for
the partial aggregate and re-aggregates the partials — two small
shuffles instead of one skewed one.

Only algebraic aggregates decompose this way (count/sum/min/max —
re-aggregable partials); avg is derived as sum/count at the end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    *,
    count_alias: str = "n",
    sum_cols: dict[str, str] | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with count + sums, resistant to hot keys.

    Stage 1 groups by (keys, salt) where salt is a uniform random
    bucket per row — a hot key's rows spread over ``n_salts``
    reducers. Stage 2 re-aggregates the ≤ n_salts partial rows per
    key. Results are exactly the unsalted group-by (sums go through
    the same types; counts are longs).
    """
    sum_cols = sum_cols or {}
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__pn"),
        *[F.sum(c).alias(f"__ps_{a}") for c, a in sum_cols.items()],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__pn").alias(count_alias),
        *[F.sum(f"__ps_{a}").alias(a) for a in sum_cols.values()],
    )
