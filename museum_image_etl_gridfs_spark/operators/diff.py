"""Snapshot diff: classify rows as added / removed / changed between
two versions of a keyed table.

The reference's pipeline re-lists the source and skips already-loaded
ids each run (incremental skip, /root/reference/src/transform_load.py);
a snapshot diff is the general form of that question — "what changed
between these two table versions?" — answered distributively.

Scale shape: ONE full-outer join on the key — the irreducible cost of
a diff. Both sides should be pruned to key + tracked columns before
calling; with both snapshots bucketed by the key the Exchange
disappears entirely. For wide rows, pass a single md5 row-hash as the
one tracked column instead of comparing column-by-column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff_frames(
    old: DataFrame,
    new: DataFrame,
    key: str,
    tracked: Sequence[str],
) -> DataFrame:
    """Diff two table versions on ``key``, comparing ``tracked``
    columns; unchanged rows are dropped. ``key`` must be unique
    within each snapshot (CDC semantics) — duplicate keys fan out
    through the full-outer join and produce one diff row per pair.

    Returns ``key, change_type ('added'|'removed'|'changed'),
    old_<c>, new_<c>`` for each tracked column ``c``.

    Spark full-outer gotcha (pinned in tests/test_diff.py): after
    ``a.join(b, "key", "full_outer")`` the key is coalesced and
    ``b["key"].isNull()`` silently stops detecting the missing side —
    so the keys are renamed apart and coalesced explicitly here.
    """
    a = old.select(
        F.col(key).alias("__a_key"),
        *[F.col(c).alias(f"old_{c}") for c in tracked],
    )
    b = new.select(
        F.col(key).alias("__b_key"),
        *[F.col(c).alias(f"new_{c}") for c in tracked],
    )
    d = a.join(b, a["__a_key"] == b["__b_key"], "full_outer")
    differs = None
    for c in tracked:
        ne = ~(F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")))
        differs = ne if differs is None else (differs | ne)
    change = (
        F.when(F.col("__a_key").isNull(), "added")
        .when(F.col("__b_key").isNull(), "removed")
        .when(differs, "changed")
    )
    out_cols = [f"old_{c}" for c in tracked] + [f"new_{c}" for c in tracked]
    return (
        d.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            F.coalesce("__a_key", "__b_key").alias(key),
            "change_type",
            *out_cols,
        )
    )
