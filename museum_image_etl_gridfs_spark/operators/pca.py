"""Distributed PCA over an embedding column.

The standard scale decomposition (same shape Spark MLlib's RowMatrix
PCA uses): the d×d covariance is assembled from ONE distributed pass
of per-partition partial sums (count, Σx, Σxxᵀ) — O(partitions · d²)
driver bytes, never the data — and the eigendecomposition runs on the
driver because d×d is tiny (64×64 here) regardless of row count.
Projection is then a narrow, shuffle-free map with the k×d component
matrix shipped in the task closure.

Like ``kmeans.py``, the only ``collect()`` is the partial-sum rows —
bounded by partition count, not data size — and partials are
accumulated in sorted order so refits are bit-identical.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def pca_fit(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 2,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit a k-component PCA; returns ``(mean[d], components[k,d],
    explained_variance_ratio[k])``.

    Component signs are canonicalized (largest-|loading| coordinate
    made positive) so the decomposition is unique and golden-stable.
    """

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnt, s, ss = 0, None, None
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cnt += len(x)
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if cnt:
            yield pd.DataFrame(
                {"cnt": [cnt], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, "cnt long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("no vectors to fit")
    d = len(rows[0]["s"])
    n, s, ss = 0, np.zeros(d), np.zeros((d, d))
    # stable accumulation order so refits are bit-identical
    for r in sorted(rows, key=lambda r: (r["cnt"], r["s"])):
        n += r["cnt"]
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × d
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(evals.sum())
    ratio = np.asarray([float(evals[o]) / total for o in order])
    return mean, comps, ratio


def pca_project(
    emb: DataFrame,
    mean: np.ndarray,
    comps: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple = (),
    round_to: int = 4,
) -> DataFrame:
    """Project every vector onto the fitted components — narrow map,
    no shuffle; the k×d matrix rides in the closure (tiny broadcast).

    Scores are rounded so residual float jitter from differing
    partition layouts cannot move a value across a print boundary.
    """
    k = comps.shape[0]
    keep = [id_col, *extra_cols]
    # passthrough columns keep their INPUT types — hardcoding would
    # silently break any non-int extra column at the Arrow boundary
    in_types = {f.name: f.dataType.simpleString() for f in emb.schema.fields}
    out_schema = ", ".join(
        [f"{c} {in_types[c]}" for c in keep]
        + [f"pc{i + 1} double" for i in range(k)]
    )

    def project(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            z = np.round((x - mean) @ comps.T, round_to)
            out = {c: pdf[c].values for c in keep}
            for i in range(k):
                out[f"pc{i + 1}"] = z[:, i]
            yield pd.DataFrame(out)

    return emb.select(*keep, vec_col).mapInPandas(project, out_schema)
