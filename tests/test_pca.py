"""Distributed PCA semantics (operators/pca.py): the partial-sum
covariance + driver eigh must equal a plain numpy PCA on the same
rows, be orthonormal, and be invariant to partition layout."""

from __future__ import annotations

import numpy as np
import pytest

from museum_image_etl_gridfs_spark.operators.pca import pca_fit, pca_project


def _toy_df(spark, n=80, d=6, parts=5):
    rng = np.random.RandomState(7)
    # anisotropic: variance concentrated along one latent direction
    latent = rng.randn(n, 1) * 5.0
    direction = rng.randn(1, d)
    x = latent @ direction + rng.randn(n, d) * 0.1
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(parts),
        x,
    )


def test_fit_matches_numpy_covariance_eig(spark):
    df, x = _toy_df(spark)
    mean, comps, ratio = pca_fit(df, k=2)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, np.argsort(evals)[::-1][:2]].T
    for i in range(2):  # compare up to sign
        assert (
            np.allclose(comps[i], top[i], atol=1e-8)
            or np.allclose(comps[i], -top[i], atol=1e-8)
        )
    # one dominant latent direction -> pc1 explains nearly everything
    assert ratio[0] > 0.99 and ratio[0] >= ratio[1]


def test_components_orthonormal_and_sign_canonical(spark):
    df, _ = _toy_df(spark)
    _, comps, _ = pca_fit(df, k=2)
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-9)
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_projection_matches_local_and_partition_invariant(spark):
    df1, x = _toy_df(spark, parts=1)
    df7, _ = _toy_df(spark, parts=7)
    mean1, comps1, _ = pca_fit(df1, k=2)
    mean7, comps7, _ = pca_fit(df7, k=2)
    p1 = pca_project(df1, mean1, comps1).toPandas().sort_values("vec_id")
    p7 = pca_project(df7, mean7, comps7).toPandas().sort_values("vec_id")
    assert np.allclose(p1[["pc1", "pc2"]].values, p7[["pc1", "pc2"]].values)
    want = np.round((x - x.mean(axis=0)) @ comps1.T, 4)
    assert np.allclose(p1[["pc1", "pc2"]].values, want, atol=2e-4)


def test_fit_raises_on_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pca_fit(empty)
