"""Distributed exact global order statistics — ntile / row_number /
running totals — without a global window.

A bare ``Window.orderBy`` (no partitionBy) moves every row into ONE
task: the classic scale-killer (measured 12x superlinear at sf1 on
the deciles query before this rewrite). ``repartitionByRange`` can't
fix it either — its split-point sampling reseeds per job, so
partition ids observed in one action don't match the next.

All operators here share one machinery:

1. range ids from native ``width_bucket`` over driver-collected
   min/max of the leading sort column — codegen'd, value-monotone,
   a pure function of the row (stable across jobs);
2. per-bucket partials (counts / sums) → the only ``collect()``,
   O(buckets) rows (the kmeans-partials pattern) → broadcast
   cumulative offsets;
3. a WITHIN-bucket window for local positions / running sums;
4. global value = bucket offset + local value.

Every stage is n/p per task. Bucket BALANCE is approximate under
value skew (a hot range widens one task) while bucket MEMBERSHIP
stays exact; pass a larger ``buckets_per_core`` to smooth skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_range_pid(
    df: DataFrame, order_keys: Sequence[str], buckets_per_core: int
) -> DataFrame | None:
    """Append a job-stable range id ``__pid`` from the lead sort key.

    Returns ``None`` for an empty input. Raises on NULL/NaN lead keys
    — engines disagree on their ordering (Spark NULLS FIRST vs DuckDB
    NULLS LAST) and ``width_bucket(NaN, ...)`` yields a NULL pid whose
    rows would be SILENTLY dropped by the offsets inner join.
    """
    lead = order_keys[0]
    spark = df.sparkSession
    nb = max(spark.sparkContext.defaultParallelism, 2) * buckets_per_core
    # The machinery reads its input 3x (min/max probe, per-bucket
    # partials, final join). A lazy checkpoint materializes the
    # upstream ONCE at the probe and pins its partitioning; without it
    # an expensive upstream (join + groupBy) re-executes per pass
    # (measured 17.7 s -> 4 s on the Gini query at sf0.1).
    df = df.localCheckpoint(eager=False)
    mn, mx, n_null, n_nan = df.agg(
        F.min(lead),
        F.max(lead),
        F.count(F.when(F.col(lead).isNull(), 1)),
        F.count(F.when(F.isnan(F.col(lead).cast("double")), 1)),
    ).first()
    if n_null:  # least()/width_bucket would silently misplace NULLs
        raise ValueError(f"global order op: NULL values in lead key {lead!r}")
    if n_nan:
        raise ValueError(f"global order op: NaN values in lead key {lead!r}")
    if mn is None:
        return None
    pid_expr = (
        F.lit(1)
        if mn == mx
        else F.least(
            F.width_bucket(F.col(lead), F.lit(mn), F.lit(mx), nb), F.lit(nb)
        )
    )
    return df.withColumn("__pid", pid_expr)


def _global_positions(
    df: DataFrame, order_keys: Sequence[str], buckets_per_core: int
) -> tuple[DataFrame, int] | None:
    """(df + ``__gpos`` global 1-based row number, total row count)."""
    t = _with_range_pid(df, order_keys, buckets_per_core)
    if t is None:
        return None
    spark = df.sparkSession
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
    return pos, n


def global_row_number(
    df: DataFrame,
    order_keys: Sequence[str],
    *,
    out_col: str = "row_num",
    buckets_per_core: int = 4,
) -> DataFrame:
    """Append ``out_col`` = ``row_number() OVER (ORDER BY order_keys)``
    with no single-task stage.

    The first key must be numeric and NON-NULL/NaN-free; the full key
    list must be a strict total order for deterministic numbering.
    """
    got = _global_positions(df, order_keys, buckets_per_core)
    if got is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    pos, _ = got
    return pos.withColumnRenamed("__gpos", out_col).drop("__pid", "__off")


def running_totals(
    df: DataFrame,
    order_keys: Sequence[str],
    value_cols: Sequence[str],
    *,
    prefix: str = "cum_",
    buckets_per_core: int = 4,
) -> DataFrame:
    """Append ``prefix + c`` = running ``SUM(c) OVER (ORDER BY
    order_keys ROWS UNBOUNDED PRECEDING)`` for each value column,
    distributively (the two-pass prefix-sum: per-bucket totals →
    broadcast exclusive offsets → within-bucket running window).

    Value columns should be exact types (integral / DECIMAL) so the
    result is independent of bucket boundaries; NULL values are not
    supported (the offset arithmetic would silently treat them as 0).
    """
    # the SUM-widened result type per value column (long for ints,
    # widened decimal) — used by BOTH the empty and non-empty paths so
    # the output schema never depends on whether the input had rows
    sum_types = {
        f.name: f.dataType
        for f in df.groupBy()
        .agg(*[F.sum(c).alias(f"__off_{c}") for c in value_cols])
        .schema.fields
    }
    t = _with_range_pid(df, order_keys, buckets_per_core)
    if t is None:
        out = df
        for c in value_cols:
            out = out.withColumn(
                prefix + c, F.col(c).cast(sum_types[f"__off_{c}"])
            )
        return out
    spark = df.sparkSession
    # per-bucket NULL counts ride along in the same aggregate pass:
    # SUM ignores NULLs, so a bucket with SOME NULLs would pass a
    # sum-is-NULL check yet yield NULL running totals for rows before
    # the bucket's first non-NULL (NULL + offset = NULL), where real
    # SQL running sums would carry the prior-bucket offset — refuse
    # loudly instead of diverging silently (mirrors the lead-key
    # NULL/NaN guard in _with_range_pid).
    agg_df = t.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__off_{c}") for c in value_cols],
        *[
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}")
            for c in value_cols
        ],
    )
    by_pid = {r["__pid"]: r for r in agg_df.collect()}
    rows, acc = [], {c: None for c in value_cols}
    for pid in sorted(by_pid):
        rows.append((int(pid), *[acc[c] for c in value_cols]))
        for c in value_cols:
            if by_pid[pid][f"__nulls_{c}"]:
                raise ValueError(
                    f"running_totals: NULL values in {c!r} are not "
                    "supported (running-sum carry would diverge from "
                    "SQL semantics)"
                )
            v = by_pid[pid][f"__off_{c}"]
            if v is None:
                raise ValueError(f"running_totals: NULL sum in {c!r}")
            acc[c] = v if acc[c] is None else acc[c] + v
    # offsets carry the SUM's type (e.g. long for ints, widened
    # decimal) — never the narrower input type
    from pyspark.sql.types import StructType

    off_schema = StructType(
        [f for f in agg_df.schema.fields if not f.name.startswith("__nulls_")]
    )
    off = F.broadcast(spark.createDataFrame(rows, off_schema))
    local = (
        Window.partitionBy("__pid")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = t.join(off, "__pid")
    for c in value_cols:
        dt = sum_types[f"__off_{c}"]
        out = out.withColumn(
            prefix + c,
            # the + may widen decimals one more digit; cast back to the
            # sum type (lossless — a prefix sum is bounded by the total)
            (
                F.sum(c).over(local)
                + F.coalesce(F.col(f"__off_{c}"), F.lit(0).cast(dt))
            ).cast(dt),
        )
    return out.drop("__pid", *[f"__off_{c}" for c in value_cols])


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
    got = _global_positions(df, order_keys, buckets_per_core)
    if got is None:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    pos, n = got
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
