"""MERGE-style upsert (SURVEY.md S8 at scale).

The reference's write-back is per-row ``update_one({$set: ...})`` —
N round-trips. The distributed form is a keyed MERGE: full-outer
join target↔updates, updates win per column, then a full (or
partition-scoped) overwrite of the table. This module implements the
dataframe-level merge; storage engines with native MERGE (Delta,
Iceberg) replace the overwrite with a transactional commit while the
join semantics stay exactly these.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    insert_missing: bool = True,
) -> DataFrame:
    """Upsert ``updates`` into ``target`` on ``keys``.

    - matched rows: non-key columns present in ``updates`` take the
      update's value (including explicit NULLs — set-to-NULL works);
    - unmatched update rows: inserted when ``insert_missing``
      (columns absent from ``updates`` come out NULL);
    - unmatched target rows: kept verbatim.

    One shuffle on the keys (or zero with a broadcast-sized update
    side). Column set of the result == column set of ``target``.
    """
    keys = list(keys)
    update_cols = [c for c in updates.columns if c not in keys]
    missing = set(update_cols) - set(target.columns)
    if missing:
        raise ValueError(f"update columns not in target: {sorted(missing)}")

    # explicit presence marker: robust to update rows whose payload
    # columns are all NULL (a "set to NULL" update is still a match)
    u = updates.withColumn("__upd", F.lit(True)).alias("u")
    t = target.alias("t")
    how = "full_outer" if insert_missing else "left_outer"
    joined = t.join(u, keys, how)
    matched = F.col("__upd").isNotNull()

    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.col(c))  # join on names coalesces keys
        elif c in update_cols:
            out_cols.append(
                F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)
