"""Join operators beyond plain equi-joins (SURVEY.md §2.3 ABSENT rows).

The reference's only joins are per-row point lookups (J1/J3); a
complete engine needs the temporal/range forms analytics actually
use. Both are built scale-first:

- :func:`asof_join` — union + window, NOT a range self-join: one
  shuffle on the key, state = one row carried by the window — the
  only shape that survives 100 TB (a range-condition join would
  explode to O(n*m) pairs per key before filtering).
- :func:`range_join` — non-equi join against a (broadcast) bounds
  table; with a small build side Catalyst plans
  BroadcastNestedLoopJoin, which is the right physical choice —
  probe stays partition-local, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    *,
    right_values: Sequence[str],
    strict: bool = True,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` (``<`` when ``strict``) per key.

    Implementation: tag both sides, UNION, sort within key by time,
    and carry the last-seen right values forward with a running
    ``last(..., ignorenulls)`` window. One shuffle on ``on``; no
    range explosion. ``tolerance_seconds`` drops matches older than
    the horizon (like pandas ``merge_asof(tolerance=...)``).

    Left columns are preserved; matched right values arrive as
    ``right_values`` columns (NULL when no prior right row exists).
    """
    on = list(on)
    lt, rt = F.col(left_time), F.col(right_time)

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        lt.alias("__t"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.lit(0).alias("__is_left"),
        rt.alias("__t"),
        *[F.col(c) for c in right_values],
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows sort before left rows at the same timestamp iff the
    # join is inclusive (<=): ascending __is_left puts right (0) first
    tie = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    horizon = None
    if tolerance_seconds is not None:
        t_match = F.last(
            F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True
        ).over(w)
        horizon = F.col("__t").cast("long") - t_match.cast("long") <= F.lit(
            tolerance_seconds
        )
    # carry all right values as ONE struct so they arrive atomically
    # from the same matched row — per-column last(ignorenulls) carries
    # would let a NULL field on the latest match wrongly inherit an
    # older row's non-null value
    row_struct = F.last(
        F.when(
            F.col("__is_left") == 0,
            F.struct(*[F.col(name) for name in right_values]),
        ),
        ignorenulls=True,
    ).over(w)
    carried = []
    for name in right_values:
        col = row_struct[name]
        if horizon is not None:
            col = F.when(horizon, col)
        carried.append(col.alias(name))

    out = merged.select(
        *[F.col(c) for c in left.columns if c not in ("__is_left", "__t")],
        F.col("__is_left"),
        *carried,
    ).filter(F.col("__is_left") == 1)
    return out.drop("__is_left")


def range_join(
    probe: DataFrame,
    bounds: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    *,
    broadcast_bounds: bool = True,
    inclusive_hi: bool = False,
) -> DataFrame:
    """Join each probe row to the bounds row whose interval contains
    ``value_col`` (``lo <= v < hi``, or ``<= hi`` when inclusive).

    The bounds side is broadcast by default: interval/dimension
    tables are small, and broadcasting turns a non-equi join — which
    would otherwise be a cartesian shuffle — into a partition-local
    nested-loop probe.
    """
    b = F.broadcast(bounds) if broadcast_bounds else bounds
    hi = (
        F.col(value_col) <= F.col(hi_col)
        if inclusive_hi
        else F.col(value_col) < F.col(hi_col)
    )
    return probe.join(b, (F.col(value_col) >= F.col(lo_col)) & hi, "left")
