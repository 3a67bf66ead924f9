"""Vector math over array<float> embeddings — cross-checked vs numpy."""

from __future__ import annotations

import math

import numpy as np
import pytest

from museum_image_etl_gridfs_spark.functions.vectors import (
    cosine,
    dot,
    l2_distance,
    norm,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, rng.normal(size=8).astype("float32").tolist(),
         rng.normal(size=8).astype("float32").tolist())
        for i in range(20)
    ]
    rows.append((99, [0.0] * 8, [1.0] * 8))  # zero-norm edge
    return spark.createDataFrame(rows, "id int, a array<float>, b array<float>"), rows


def test_dot_norm_cosine_l2_match_numpy(spark, vec_df):
    df, rows = vec_df
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            dot("a", "b").alias("dot"),
            norm("a").alias("na"),
            cosine("a", "b").alias("cos"),
            l2_distance("a", "b").alias("l2"),
        ).collect()
    }
    for rid, a, b in rows:
        a64 = np.asarray(a, dtype="float64")
        b64 = np.asarray(b, dtype="float64")
        r = got[rid]
        assert math.isclose(r["dot"], float(a64 @ b64), rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(r["na"], float(np.linalg.norm(a64)), rel_tol=1e-9)
        assert math.isclose(r["l2"], float(np.linalg.norm(a64 - b64)), rel_tol=1e-9)
        if np.linalg.norm(a64) == 0 or np.linalg.norm(b64) == 0:
            assert r["cos"] == 0.0
        else:
            want = float(a64 @ b64 / (np.linalg.norm(a64) * np.linalg.norm(b64)))
            assert math.isclose(r["cos"], want, rel_tol=1e-9)


def test_cosine_self_is_one(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "a array<float>")
    v = df.select(cosine("a", "a").alias("c")).collect()[0]["c"]
    assert math.isclose(v, 1.0, rel_tol=1e-12)


def test_hard_negative_mining_invariants(spark, sf_dir):
    """DPR hard negatives: every mined negative carries a label that
    DIFFERS from its anchor's, exactly top-k rows per anchor, scores
    non-increasing within an anchor, and the top negative really is
    the cosine argmax over the wrong-label corpus (numpy re-check)."""
    from museum_image_etl_gridfs_spark.catalog import load
    from museum_image_etl_gridfs_spark.plans import all_queries
    from museum_image_etl_gridfs_spark.plans.queries_vector import (
        _N_QUERIES,
        _TOP_K,
    )

    out = all_queries()["hard_negative_mining"].build(spark, sf_dir)
    rows = out.collect()
    emb = {
        r["vec_id"]: (np.asarray(r["embedding"], dtype="float64"), r["label"])
        for r in load(spark, "embeddings", sf_dir).collect()
    }
    by_anchor: dict = {}
    for r in rows:
        by_anchor.setdefault(r["qid"], []).append(r)
        assert r["neg_label"] != emb[r["qid"]][1]
        assert r["neg_label"] == emb[r["neg_id"]][1]
    assert set(by_anchor) == set(range(_N_QUERIES))
    for qid, negs in by_anchor.items():
        assert len(negs) == _TOP_K
        scores = [n["score"] for n in sorted(negs, key=lambda n: -n["score"])]
        got = [n["score"] for n in negs]
        assert sorted(got, reverse=True) == scores
        qv, qlabel = emb[qid]

        def cos(u, v):
            return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

        best = max(
            (round(cos(qv, v), 4), -vid)
            for vid, (v, lab) in emb.items()
            if lab != qlabel
        )
        assert max(got) == pytest.approx(best[0], abs=1e-9)
