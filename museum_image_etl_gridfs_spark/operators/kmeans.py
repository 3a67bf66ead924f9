"""Distributed k-means (Lloyd's) over an embedding column.

The clustering primitive behind embedding-based curation: semantic
dedup (SemDeDup-style cluster-then-prune), data mixing by cluster,
and IVF index training (operators/ann.py::assign_cells can take these
centroids instead of its first-K seed).

Spark-first execution — the same shape MLlib's KMeans uses, written
against the public DataFrame/mapInPandas API:

- **Centroids are driver state, data never moves.** Each iteration
  broadcasts the k×dim centroid matrix (tiny) to executors; the
  corpus is scanned once per iteration, never shuffled.
- **Assignment is one vectorized matmul per Arrow batch**
  (``|x-c|² = |x|² - 2·x·Cᵀ + |C|²``, argmin over k), inside
  mapInPandas — no per-row Python.
- **Partial aggregation, not groupBy.** Each batch emits at most k
  partial rows (cluster, count, float64 sum-vector); the driver sums
  the ≤ k·n_partitions partials — a treeAggregate-style reduction
  whose collect is O(k·partitions), independent of corpus size.
- **Deterministic.** Seeding is the k lowest-id vectors (i.i.d.
  fixtures make that as good as kmeans++; swap for real skew), ties
  break to the lowest cluster index, empty clusters keep their
  previous centroid. No RNG anywhere — reruns give identical models,
  which is what makes the operator testable and auditable.

At 100 TB: n_iter full scans is the irreducible cost of Lloyd's; cache
the (id, vec) projection if memory allows. Everything else — broadcast
size k·dim, collect size k·partitions — is scale-independent.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread


def _partials(centroids: np.ndarray, vec_col: str):
    """Per-batch partial (cluster, count, sum) rows for one iteration."""
    c = centroids.astype(np.float64)
    c_sq = (c * c).sum(axis=1)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + c_sq[None, :]
            lab = d.argmin(axis=1)  # ties -> lowest index
            out_c, out_n, out_s = [], [], []
            for cl in np.unique(lab):
                m = lab == cl
                out_c.append(int(cl))
                out_n.append(int(m.sum()))
                out_s.append(x[m].sum(axis=0).tolist())
            yield pd.DataFrame(
                {"cluster": out_c, "cnt": out_n, "vsum": out_s}
            )

    return run


def kmeans_fit(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
) -> np.ndarray:
    """Fit k centroids with ``n_iter`` Lloyd's iterations; returns the
    k×dim float64 centroid matrix."""
    seed_rows = (
        emb.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} vectors, got {len(seed_rows)}")
    centroids = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows]
    )
    data = emb.select(vec_col)
    for _ in range(n_iter):
        partials = data.mapInPandas(
            _partials(centroids, vec_col),
            f"cluster int, cnt long, vsum array<double>",
        ).collect()
        counts = np.zeros(k)
        sums = np.zeros_like(centroids)
        # stable accumulation order so refits are bit-identical
        for row in sorted(
            partials, key=lambda r: (r["cluster"], r["cnt"], r["vsum"])
        ):
            counts[row["cluster"]] += row["cnt"]
            sums[row["cluster"]] += np.asarray(row["vsum"])
        nonempty = counts > 0
        centroids = np.where(
            nonempty[:, None], sums / np.maximum(counts, 1)[:, None], centroids
        )
    return centroids


def kmeans_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid.

    Returns (id, cluster, sq_dist) — one narrow vectorized pass, no
    shuffle; the k×dim matrix ships inside the serialized closure
    (same mechanics as a broadcast at this size).
    """
    c = centroids.astype(np.float64)
    c_sq = (c * c).sum(axis=1)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + c_sq[None, :]
            lab = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "cluster": lab.astype("int32"),
                    "sq_dist": np.maximum(d[np.arange(len(lab)), lab], 0.0),
                }
            )

    id_type = emb.schema[id_col].dataType.simpleString()
    return (
        # single-row-group fixtures -> spread cores; no-op on wide scans
        spread(emb.select(id_col, vec_col), id_col)
        .mapInPandas(run, f"id {id_type}, cluster int, sq_dist double")
        .withColumnRenamed("id", id_col)
    )


def semantic_dedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
    keep_per_cluster: int = 10,
) -> DataFrame:
    """SemDeDup-style pruning: cluster embeddings, keep the
    ``keep_per_cluster`` points FARTHEST from their centroid in each
    cluster (farthest-from-centroid keeps the diverse examples;
    near-centroid points are the semantically redundant ones).
    Deterministic tiebreak on id. Returns (id, cluster, sq_dist).

    Per-cluster top-k via the two-phase partial merge
    (:func:`~.topk.grouped_topk`, r10): k clusters over a corpus is
    the low-cardinality-group window pathology — 1/k of all
    embeddings through one sort task at any scale.
    """
    from .topk import grouped_topk

    centroids = kmeans_fit(
        emb, id_col=id_col, vec_col=vec_col, k=k, n_iter=n_iter
    )
    assigned = kmeans_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    return grouped_topk(
        assigned,
        ["cluster"],
        [("sq_dist", False), (id_col, True)],
        keep_per_cluster,
    )
