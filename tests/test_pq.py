"""Product Quantization (operators/pq.py): determinism, exactness on
codebook-aligned data, and recall against brute-force L2."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.pq import (
    adc_topk,
    pq_encode,
    pq_fit,
)


def test_pq_fit_is_deterministic(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    a = pq_fit(emb, m=4, k=8, n_iter=3)
    b = pq_fit(emb, m=4, k=8, n_iter=3)
    assert a.shape == (4, 8, 16)
    assert np.array_equal(a, b)


def test_pq_m_must_divide_dim(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    with pytest.raises(ValueError, match="must divide"):
        pq_fit(emb, m=5, k=4, n_iter=1)


def test_adc_exact_on_codebook_aligned_vectors(spark):
    """When every vector IS a concatenation of codebook centroids, the
    quantization error is zero and ADC distances equal true squared
    L2 — the algebraic identity that pins the table math."""
    rng = np.random.default_rng(3)
    m, k, dsub = 2, 4, 3
    cb = rng.normal(size=(m, k, dsub))
    vecs = {}
    for i in range(12):
        codes = rng.integers(0, k, size=m)
        vecs[i] = np.concatenate([cb[s, codes[s]] for s in range(m)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        ["vec_id", "embedding"],
    )
    codes_df = pq_encode(emb, cb)
    q = (0, [float(x) for x in vecs[0]])
    out = adc_topk(codes_df, cb, [q], top_k=3).collect()
    got = {r["neighbor_id"]: r["approx_sq_dist"] for r in out}
    for nid, adist in got.items():
        true = float(((vecs[0] - vecs[nid]) ** 2).sum())
        assert adist == pytest.approx(true, abs=1e-3)


def test_pq_recall_on_clustered_data(spark):
    """ADC top-5 must recover true neighbors when the data HAS
    neighbor structure (clustered Gaussians). The parquet fixture's
    embeddings are near-i.i.d. — there the nearest-neighbor gap
    (top-1 1.33 vs mean 1.99 sq-dist) is smaller than the ~0.72 mean
    quantization error, so recall on it measures noise, not the
    operator; see test_pq_adc_tracks_true_distance for the fixture
    check."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 32)) * 4.0
    vecs = {}
    for i in range(200):
        vecs[i] = centers[i % 10] + rng.normal(size=32) * 0.15
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        ["vec_id", "embedding"],
    )
    cb = pq_fit(emb, m=4, k=16, n_iter=5)
    codes = pq_encode(emb, cb)
    queries = [(i, [float(x) for x in vecs[i]]) for i in range(3)]
    approx = adc_topk(codes, cb, queries, top_k=5).collect()
    for qid, _ in queries:
        got = {r["neighbor_id"] for r in approx if r["qid"] == qid}
        assert len(got) == 5
        # cluster purity, not exact-rank recall: same-cluster points
        # quantize to the SAME codes, so ADC ties inside the query's
        # cluster and the id tie-break scrambles within-cluster order
        # — the documented PQ behavior real systems fix by exact
        # re-ranking of the candidate set. What PQ must guarantee is
        # that every returned neighbor comes from the right cluster.
        assert all(n % 10 == qid % 10 for n in got), (qid, got)


def test_pq_adc_tracks_true_distance(spark, sf_dir):
    """On the (near-i.i.d.) fixture, ADC distances must still be
    POSITIVELY CORRELATED with true squared L2 — the lossy-but-
    unbiased contract that holds regardless of neighbor structure."""
    emb = load(spark, "embeddings", sf_dir)
    cb = pq_fit(emb, m=4, k=16, n_iter=5)
    codes = pq_encode(emb, cb)
    data = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    cdict = {
        r["vec_id"]: np.asarray(r["codes"])
        for r in codes.collect()
    }
    m, k, dsub = cb.shape
    q = data[0]
    tab = np.stack(
        [
            ((cb[s] - q[s * dsub : (s + 1) * dsub][None, :]) ** 2).sum(
                axis=1
            )
            for s in range(m)
        ]
    )
    true, adc = [], []
    for i, v in data.items():
        if i == 0:
            continue
        true.append(float(((q - v) ** 2).sum()))
        adc.append(float(sum(tab[s, cdict[i][s]] for s in range(m))))
    assert np.corrcoef(true, adc)[0, 1] > 0.3


def test_pq_codes_in_range_and_schema(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    cb = pq_fit(emb, m=4, k=8, n_iter=2)
    codes = pq_encode(emb, cb)
    agg = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("m_lo"),
        F.max(F.size("codes")).alias("m_hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert agg["lo"] >= 0 and agg["hi"] < 8
    assert agg["m_lo"] == agg["m_hi"] == 4
    assert agg["n"] == emb.count()


def test_ivfpq_cluster_purity_and_determinism(spark):
    """IVF-PQ on clustered data: probing the query's own cells must
    return same-cluster neighbors; two runs are bit-identical."""
    from museum_image_etl_gridfs_spark.operators.pq import ivfpq_topk

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(8, 32)) * 4.0
    vecs = {i: centers[i % 8] + rng.normal(size=32) * 0.15 for i in range(160)}
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        ["vec_id", "embedding"],
    )
    queries = [(i, [float(x) for x in vecs[i]]) for i in range(2)]
    kw = dict(k_cells=8, n_probe=2, m=4, k=8, top_k=5)
    a = sorted(map(tuple, ivfpq_topk(emb, queries, **kw).collect()))
    b = sorted(map(tuple, ivfpq_topk(emb, queries, **kw).collect()))
    assert a == b and a
    for qid, nid, _ in a:
        assert nid % 8 == qid % 8, (qid, nid)


def test_ivfpq_full_probe_beats_random_on_fixture(spark, sf_dir):
    """Full-probe IVF-PQ approx distances must correlate with true
    squared L2 on the fixture — residual encoding keeps the ADC
    contract that raw-vector PQ satisfies."""
    from museum_image_etl_gridfs_spark.operators.pq import ivfpq_topk

    emb = load(spark, "embeddings", sf_dir)
    rows = emb.select("vec_id", "embedding").collect()
    data = {r["vec_id"]: np.asarray(r["embedding"], float) for r in rows}
    q = (0, [float(x) for x in data[0]])
    out = ivfpq_topk(
        emb, [q], k_cells=4, n_probe=4, m=4, k=16, top_k=10**9
    ).collect()
    assert len(out) == len(data) - 1  # full probe scores everyone
    true = {i: float(((data[0] - v) ** 2).sum()) for i, v in data.items()}
    pairs = [(true[r["neighbor_id"]], r["approx_sq_dist"]) for r in out]
    t, a = zip(*pairs)
    assert np.corrcoef(t, a)[0, 1] > 0.3
