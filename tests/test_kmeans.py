"""k-means operator tests: exact parity with a single-machine numpy
reference implementing the identical deterministic algorithm, plus
SemDeDup invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)

K, ITERS = 4, 3


def _reference_fit(x: np.ndarray, ids: np.ndarray, k: int, n_iter: int):
    """Plain-numpy Lloyd's with the operator's exact conventions:
    seed = k lowest-id vectors, argmin ties to lowest cluster,
    empty clusters keep their centroid."""
    order = np.argsort(ids)
    c = x[order[:k]].copy()
    for _ in range(n_iter):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for j in range(k):
            m = lab == j
            if m.any():
                c[j] = x[m].sum(axis=0) / m.sum()
    return c


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, x


def test_fit_matches_numpy_reference(spark, sf_dir, emb_np):
    ids, x = emb_np
    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    got = kmeans_fit(emb, k=K, n_iter=ITERS)
    want = _reference_fit(x, ids, K, ITERS)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_assign_matches_numpy_argmin(spark, sf_dir, emb_np):
    ids, x = emb_np
    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    c = kmeans_fit(emb, k=K, n_iter=ITERS)
    got = {
        r["vec_id"]: (r["cluster"], r["sq_dist"])
        for r in kmeans_assign(emb, c).collect()
    }
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    lab = d.argmin(axis=1)
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid][0] == lab[i]
        assert got[vid][1] == pytest.approx(d[i, lab[i]], rel=1e-6, abs=1e-9)


def test_fit_is_deterministic_across_runs(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    a = kmeans_fit(emb, k=K, n_iter=2)
    b = kmeans_fit(emb.repartition(7), k=K, n_iter=2)
    # same model regardless of partitioning (stable partial reduction)
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_semantic_dedup_keeps_farthest(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    keep = 5
    kept = semantic_dedup(emb, k=K, n_iter=ITERS, keep_per_cluster=keep)
    rows = kept.collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    c = kmeans_fit(emb, k=K, n_iter=ITERS)
    full = kmeans_assign(emb, c).collect()
    sizes = {}
    for r in full:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    for cl, members in by_cluster.items():
        assert len(members) == min(keep, sizes[cl])
        # every kept point is at least as far as every dropped point
        kept_ids = {m["vec_id"] for m in members}
        min_kept = min(m["sq_dist"] for m in members)
        dropped = [
            r["sq_dist"]
            for r in full
            if r["cluster"] == cl and r["vec_id"] not in kept_ids
        ]
        assert all(d <= min_kept + 1e-9 for d in dropped)
