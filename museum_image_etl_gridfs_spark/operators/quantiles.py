"""Distributed exact ntile — global order statistics without a
global window.

A bare ``Window.orderBy`` (no partitionBy) moves every row into ONE
task: the classic scale-killer (measured 12x superlinear at sf1 on
the deciles query before this rewrite). ``repartitionByRange`` can't
fix it either — its split-point sampling reseeds per job, so
partition ids observed in one action don't match the next.

This operator computes exact ``ntile(k)`` semantics distributively:

1. range ids from native ``width_bucket`` over driver-collected
   min/max of the leading sort column — codegen'd, value-monotone,
   a pure function of the row (stable across jobs);
2. per-bucket counts → the only ``collect()``, O(buckets) rows
   (the kmeans-partials pattern) → broadcast cumulative offsets;
3. a WITHIN-bucket window for local row numbers;
4. ntile's exact base/remainder arithmetic on offset + local
   position.

Every stage is n/p per task. Bucket BALANCE is approximate under
value skew (a hot range widens one task) while bucket MEMBERSHIP
stays exact; pass a larger ``buckets_per_core`` to smooth skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ntile_exact(
    df: DataFrame,
    order_keys: Sequence[str],
    k: int,
    *,
    out_col: str = "bucket",
    buckets_per_core: int = 4,
) -> DataFrame:
    """Append ``out_col`` = exact ``ntile(k)`` over the total order
    ``order_keys`` (the first key must be numeric and NON-NULL —
    engines disagree on NULL ordering (Spark NULLS FIRST vs DuckDB
    NULLS LAST), so a NULL lead key has no portable bucket; the full
    key list must be a strict total order for deterministic
    membership).

    Equivalent to ``ntile(k) OVER (ORDER BY order_keys)`` — verified
    against DuckDB in the decile queries — but with no single-task
    stage.
    """
    lead = order_keys[0]
    spark = df.sparkSession
    t0 = df.select(*order_keys)
    nb = max(spark.sparkContext.defaultParallelism, 2) * buckets_per_core
    mn, mx, n_null, n_nan = t0.agg(
        F.min(lead),
        F.max(lead),
        F.count(F.when(F.col(lead).isNull(), 1)),
        F.count(F.when(F.isnan(F.col(lead).cast("double")), 1)),
    ).first()
    if n_null:  # least()/width_bucket would silently misplace NULLs
        raise ValueError(f"ntile_exact: NULL values in lead key {lead!r}")
    if n_nan:  # width_bucket(NaN, ...) -> NULL pid, rows would be
        # SILENTLY dropped by the offsets inner join (real ntile()
        # ranks NaN last) — refuse, like the NULL case
        raise ValueError(f"ntile_exact: NaN values in lead key {lead!r}")
    if mn is None:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    pid_expr = (
        F.lit(1)
        if mn == mx
        else F.least(
            F.width_bucket(F.col(lead), F.lit(mn), F.lit(mx), nb), F.lit(nb)
        )
    )
    t = df.withColumn("__pid", pid_expr)
    cnt = {
        r["__pid"]: r["cnt"]
        for r in t.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(cnt.values())
    offsets, acc = {}, 0
    for pid in sorted(cnt):
        offsets[pid] = acc
        acc += cnt[pid]
    off = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            "__pid int, __off long",
        )
    )
    local = Window.partitionBy("__pid").orderBy(*order_keys)
    pos = t.join(off, "__pid").withColumn(
        "__gpos", F.col("__off") + F.row_number().over(local)
    )
    base, rem = n // k, n % k
    cut = rem * (base + 1)
    bucket = (
        F.when(F.col("__gpos") <= cut, (F.col("__gpos") - 1) / (base + 1))
        .otherwise(rem + (F.col("__gpos") - cut - 1) / max(base, 1))
    )
    return (
        pos.withColumn(out_col, (F.floor(bucket) + 1).cast("int"))
        .drop("__pid", "__off", "__gpos")
    )
