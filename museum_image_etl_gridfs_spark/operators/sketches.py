"""Count-min-sketch heavy hitters — frequent-item detection without
shuffling the corpus.

The reference has no sketching (its only aggregation is the pymongo
duplicate $group, ``src/transform_load.py:48-50``); this is the
training-data-pipeline extension: find tokens/domains/ids whose global
frequency exceeds ``phi * N`` over a corpus too large to groupBy
cheaply.

Algorithm (classic distributed CMS + pigeonhole candidates + exact
verify, one corpus scan + one candidate-only recount):

1. One ``mapInPandas`` pass over the UNSHUFFLED item stream. Each
   partition p (local total t_p) emits (a) its local heavy
   candidates — every item with local count ≥ frac·t_p/2. This bar
   has NO false negatives under arbitrary partition skew: if an item
   with global count C ≥ frac·N missed the bar everywhere, then
   C = Σc_p < (frac/2)·Σt_p = frac·N/2 ≤ C/2 — contradiction.
   And (b) a depth×width count-min partial (numpy, vectorized) plus
   one local-total row.
2. The partials merge elementwise (groupBy over flattened (row, pos)
   cells — a shuffle of depth×width longs per partition, kilobytes).
   The merged sketch is collected driver-side (it is O(depth·width),
   like k-means partials) and used to prune candidates: CMS estimates
   only OVER-count, so est < threshold ⇒ true count < threshold —
   pruning is also false-negative-free.
3. Exact verify: recount ONLY the surviving candidates (broadcast
   hash semi-join + partial-agg groupBy — the shuffle carries a few
   rows per candidate per partition, not the corpus).

At 100 TB: the corpus is scanned in place (no shuffle of the item
stream), sketch traffic is ~depth·width·8 bytes per partition, and
the recount groupBy touches only candidate rows. Output counts are
EXACT — the sketch only routes work — so the operator is
oracle-checkable.
"""

from __future__ import annotations


import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: schema of the single mapInPandas pass: candidate rows carry
#: (item, local_count); sketch rows carry (cms_row, pos, val) triples
#: pre-flattened so the merge is a plain groupBy — no array columns.
_PASS_SCHEMA = (
    "kind string, item string, local_count long, cms_row int, pos int, val long"
)


def _buckets(row: int, items, width: int):
    """Stable per-row hash buckets for an ARRAY of items, vectorized
    (pandas siphash with a row-keyed 16-byte key — reproducible across
    workers/driver/runs, unlike Python's salted ``hash``).

    r12 (guide §4.2): the md5-per-(row, item) Python loop this
    replaces hashed every unique token 4× per partition interpreted —
    ~3× the cost of the entire value_counts pass; the sketch only
    ROUTES work (the output is an exact recount), so the hash family
    is swappable without any output change.
    """
    import numpy as np
    import pandas as pd

    key = f"cms-row-{row:04d}".ljust(16)[:16]
    arr = np.asarray(items, dtype=object)
    return (pd.util.hash_array(arr, hash_key=key) % width).astype("int64")


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str,
    threshold_frac: float,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Items whose global frequency ≥ ``threshold_frac`` of all items.

    ``items`` is a one-column-of-interest DataFrame (one row per item
    occurrence). Returns ``(item, freq)`` with EXACT frequencies.
    """
    spark = items.sparkSession
    src = items.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )

    def one_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counts: pd.Series | None = None
        for pdf in batches:
            vc = pdf["item"].value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
        if counts is None:
            return
        counts = counts.astype("int64")
        local_total = int(counts.sum())
        # (a) local candidates at the skew-proof bar frac·t_p/2 (see
        # module docstring for the no-false-negative proof); the
        # local top-64 is extra insurance for pathological splits.
        bar = max(1, int(math.floor(threshold_frac * local_total / 2)))
        cand = counts[counts >= bar]
        if len(cand) < min(64, len(counts)):
            cand = counts.nlargest(64)
        cand_df = pd.DataFrame(
            {
                "kind": "cand",
                "item": cand.index.astype(str),
                "local_count": cand.values.astype("int64"),
                "cms_row": pd.array([None] * len(cand), dtype="Int32"),
                "pos": pd.array([None] * len(cand), dtype="Int32"),
                "val": pd.array([None] * len(cand), dtype="Int64"),
            }
        )
        # (b) CMS partial: depth rows of width counters
        cms = np.zeros((depth, width), dtype="int64")
        uniq = counts.index.astype(str).to_numpy(dtype=object)
        vals = counts.values
        for r in range(depth):
            np.add.at(cms[r], _buckets(r, uniq, width), vals)
        rows, poss = np.nonzero(cms)
        cms_df = pd.DataFrame(
            {
                "kind": "cms",
                "item": None,
                "local_count": local_total,
                "cms_row": rows.astype("int32"),
                "pos": poss.astype("int32"),
                "val": cms[rows, poss],
            }
        )
        total_df = pd.DataFrame(
            {
                "kind": ["total"],
                "item": [None],
                "local_count": pd.array([local_total], dtype="Int64"),
                "cms_row": pd.array([None], dtype="Int32"),
                "pos": pd.array([None], dtype="Int32"),
                "val": pd.array([local_total], dtype="Int64"),
            }
        )
        yield pd.concat([cand_df, cms_df, total_df], ignore_index=True)

    passed = src.mapInPandas(one_pass, _PASS_SCHEMA)
    # merge the partials DISTRIBUTED (one shuffle of sketch cells +
    # candidate names), then ONE collect of the merged result: the
    # driver receives ≤ depth·width cells + the candidate union + one
    # total — independent of partition count (a raw collect of the
    # per-partition partials would scale with #partitions), and the
    # single action means the corpus scan runs exactly once.
    merged = (
        passed.groupBy("kind", "item", "cms_row", "pos")
        .agg(
            F.sum("val").alias("val"),
            F.sum("local_count").alias("local_count"),
        )
        .collect()
    )
    cms: dict[tuple[int, int], int] = {}
    total = 0
    cand_counts: dict[str, int] = {}
    for row in merged:
        kind = row["kind"]
        if kind == "cms":
            cms[(row["cms_row"], row["pos"])] = row["val"]
        elif kind == "total":
            total += row["val"]
        else:  # candidate
            cand_counts[row["item"]] = row["local_count"]
    threshold = int(math.ceil(threshold_frac * total))

    # prune the candidate union by the CMS upper bound (min over rows
    # ≥ exact count, so pruning is false-negative-free).
    import numpy as np

    cand_items = np.asarray(list(cand_counts), dtype=object)
    if len(cand_items):
        est = np.full(len(cand_items), np.iinfo(np.int64).max, dtype="int64")
        for r in range(depth):
            bs = _buckets(r, cand_items, width)
            est = np.minimum(
                est, np.fromiter((cms.get((r, int(b)), 0) for b in bs),
                                 dtype="int64", count=len(bs))
            )
        survivors = [str(i) for i in cand_items[est >= threshold]]
    else:
        survivors = []

    if not survivors:
        return spark.createDataFrame([], "item string, freq long")

    # exact recount of survivors only: broadcast semi-join keeps the
    # shuffle to candidate rows, partial agg combines map-side.
    surv_df = spark.createDataFrame([(s,) for s in survivors], "item string")
    return (
        src.join(F.broadcast(surv_df), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= F.lit(threshold))
    )


def tokens_of(text: Column | str, *, lower: bool = True) -> Column:
    """Whitespace token array matching the DuckDB oracle rendering
    ``regexp_split_to_array(lower(trim(text)), '\\s+')``."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    if lower:
        t = F.lower(t)
    return F.when(t.isNull() | (t == ""), F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
