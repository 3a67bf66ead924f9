"""Distributed skyline (Pareto frontier) operator.

Returns the rows not dominated by any other row, where row *a*
dominates row *b* iff *a* is ≤ *b* on every minimize-column, ≥ on
every maximize-column, and strictly better on at least one. Ties on
every dimension dominate neither way — both survive.

No reference analog (the reference computes no multi-criteria
queries); this is the classic multi-objective "best tradeoff" OLAP
operator (cheapest-vs-largest part, fastest-vs-freshest supplier).

Two-phase distributed shape (the standard partition-parallel skyline):

1. **Local skyline per partition** via ``mapInPandas`` — the skyline
   operator is a *reducer*: any globally non-dominated row is also
   locally non-dominated, so each partition can discard its locally
   dominated rows without coordination. Implemented as sort-filter
   skyline (SFS): points scan in ascending order of the monotone sum
   ranking, so a point can only be dominated by already-accepted
   skyline points; each point compares (vectorized numpy) against the
   current skyline only, which stays small in practice.
2. **Global pass**: the surviving union (|skyline| per partition) is
   coalesced to one partition and filtered once more with the same
   kernel.

At 100 TB the corpus is scanned in place (no shuffle — phase 1 runs
on scan partitions), and phase 2 moves only the per-partition
skylines. Degenerate anti-correlated data can make skylines large;
the kernel stays vectorized and chunk-bounded, but phase 2 assumes
the union fits one task — the standard assumption for skyline
cardinalities in practice.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

_CHUNK = 1024


def _skyline_mask(X) -> "list[int]":
    """Indices of non-dominated rows of ``X`` (n×d, all-minimize)."""
    import numpy as np

    n = len(X)
    if n == 0:
        return []
    # SFS order: in exact arithmetic strict dominance implies a
    # strictly smaller sum, so scanning by ascending sum means only
    # already-accepted points can dominate a new point. float64
    # rounding can break that invariant for near-equal sums (a
    # dominated point's sum can ROUND equal to its dominator's and be
    # scanned first), so acceptance below also evicts any accepted
    # point the new point dominates — correctness no longer leans on
    # the ordering, which remains purely a pruning heuristic.
    order = np.argsort(X.sum(axis=1), kind="stable")
    Xs = X[order]
    sky = np.empty((0, X.shape[1]), dtype=X.dtype)
    kept: list[int] = []
    for start in range(0, n, _CHUNK):
        chunk = Xs[start : start + _CHUNK]
        # vs accepted skyline: dominated iff some sky row is ≤ on every
        # dim AND ≠ somewhere (full ties dominate neither way — keep
        # exact duplicates of a skyline point)
        if len(sky):
            le = (sky[None, :, :] <= chunk[:, None, :]).all(-1)
            ne = (sky[None, :, :] != chunk[:, None, :]).any(-1)
            dom = (le & ne).any(-1)
        else:
            dom = np.zeros(len(chunk), dtype=bool)
        # intra-chunk: an accepted row knocks out later rows it
        # dominates
        for i in range(len(chunk)):
            if dom[i]:
                continue
            if len(sky):
                # evict accepted points the new point dominates
                # (possible only under sum-rounding ties)
                beats = (chunk[i] <= sky).all(-1) & (chunk[i] != sky).any(-1)
                if beats.any():
                    keep_mask = ~beats
                    sky = sky[keep_mask]
                    kept = [k for k, m in zip(kept, keep_mask) if m]
            kept.append(int(order[start + i]))
            sky = np.vstack([sky, chunk[i : i + 1]])
            if i + 1 < len(chunk):
                dom[i + 1 :] |= (chunk[i + 1 :] >= chunk[i]).all(-1) & (
                    chunk[i + 1 :] != chunk[i]
                ).any(-1)
    return sorted(kept)


def skyline(
    df: DataFrame,
    minimize: Sequence[str] = (),
    maximize: Sequence[str] = (),
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier of the given columns.

    NULL in any criterion column excludes the row (NULL is not
    comparable under dominance).
    """
    if not minimize and not maximize:
        raise ValueError("skyline needs at least one criterion column")
    min_cols, max_cols = list(minimize), list(maximize)
    for c in (*min_cols, *max_cols):
        df = df.filter(df[c].isNotNull())
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if len(pdf) == 0:
            return
        X = np.column_stack(
            [pdf[c].to_numpy(dtype="float64") for c in min_cols]
            + [-pdf[c].to_numpy(dtype="float64") for c in max_cols]
        )
        yield pdf.iloc[sorted(_skyline_mask(X))]

    local_sky = df.mapInPandas(local, schema)
    # repartition(1), NOT coalesce(1): coalesce is a narrow
    # dependency, so it would collapse phase 1 into the same single
    # task and feed the WHOLE dataset to one pandas worker. The
    # shuffle boundary keeps phase 1 parallel on the scan partitions
    # and moves only the per-partition frontiers.
    return local_sky.repartition(1).mapInPandas(local, schema)
