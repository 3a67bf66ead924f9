"""Permutation-robustness of the blocked pair kernels (ADVICE r10
high): the self-join's two collect_list branches are recomputed
independently, so a diagonal cell can see ms_a and ms_b holding the
SAME members in DIFFERENT orders (shuffle-fetch arrival, task retry,
AQE). The duplicate-free guarantee must therefore come from an
ID-based mask, never an index triangle — these tests feed the batch
kernels permuted packed lists directly, which local-mode end-to-end
runs can never produce."""

from __future__ import annotations

import numpy as np
import pandas as pd

from museum_image_etl_gridfs_spark.operators.ann import (
    _cosine_score_fn,
    _jaccard_score_fn,
    _np_id_dtype,
)


def _collect(score, batch):
    frames = [f for f in score(iter([batch])) if len(f)]
    if not frames:
        return set()
    out = pd.concat(frames)
    return {(a, b) for a, b in zip(out.iloc[:, 0], out.iloc[:, 1])}


def test_cosine_diagonal_mask_is_order_independent():
    rng = np.random.default_rng(7)
    vecs = {i: rng.normal(size=8) for i in range(10)}
    ms = [{"id": i, "v": list(vecs[i])} for i in range(10)]
    perm = [ms[j] for j in rng.permutation(10)]
    score = _cosine_score_fn(0.01, 4, "int64")

    # brute-force expected pair set at threshold 0.01
    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4
        )

    want = {
        (i, j)
        for i in range(10)
        for j in range(i + 1, 10)
        if cos(vecs[i], vecs[j]) >= 0.01
    }
    aligned = _collect(
        score, pd.DataFrame({"blk_a": [0], "blk_b": [0], "ms_a": [ms], "ms_b": [ms]})
    )
    permuted = _collect(
        score, pd.DataFrame({"blk_a": [0], "blk_b": [0], "ms_a": [ms], "ms_b": [perm]})
    )
    assert aligned == want
    assert permuted == want  # np.triu by index would fail this


def test_jaccard_diagonal_mask_is_order_independent():
    rng = np.random.default_rng(11)
    toks = {i: sorted(rng.choice(30, size=12, replace=False)) for i in range(8)}
    ms = [{"id": i, "ts": [str(t) for t in toks[i]]} for i in range(8)]
    perm = [ms[j] for j in rng.permutation(8)]
    score = _jaccard_score_fn(0.1, "int64")

    def jac(a, b):
        sa, sb = set(a), set(b)
        return len(sa & sb) / len(sa | sb)

    want = {
        (i, j)
        for i in range(8)
        for j in range(i + 1, 8)
        if jac(toks[i], toks[j]) >= 0.1
    }
    aligned = _collect(
        score, pd.DataFrame({"diag": [True], "ms_a": [ms], "ms_b": [ms]})
    )
    permuted = _collect(
        score, pd.DataFrame({"diag": [True], "ms_a": [ms], "ms_b": [perm]})
    )
    assert aligned == want
    assert permuted == want


def test_empty_sentinel_dtype_follows_id_type():
    """ADVICE r10 low: string ids must get object-dtype empty frames,
    not a hardcoded int64 that mismatches the Arrow schema."""
    assert _np_id_dtype("string") == "object"
    assert _np_id_dtype("bigint") == "int64"
    score = _jaccard_score_fn(0.9, _np_id_dtype("string"))
    frames = list(
        score(iter([pd.DataFrame({"diag": [], "ms_a": [], "ms_b": []})]))
    )
    assert frames[-1]["id_a"].dtype == object


def test_block_count_scales_with_input():
    """VERDICT r11 #1: BOTH blocked pair kernels must derive their
    block count from measured input size — a fixed count tuned at one
    SF is a quadratic memory cliff at the next (cosine's fixed 8 cost
    2.8 GB/task and 417 s at sf3 before the adaptive rule)."""
    from museum_image_etl_gridfs_spark.operators.ann import _blocks_for

    assert _blocks_for(0, 2048, floor=2) == 2
    assert _blocks_for(2500, 2048, floor=2) == 2
    assert _blocks_for(7500, 2048, floor=2) == 4
    # 100x: blocks grow linearly, sub-block size stays bounded
    n = 250_000
    b = _blocks_for(n, 2048, floor=2)
    assert b == -(-n // 2048) and n / b <= 2048
    # cosine's derivation routes through the same helper
    assert _blocks_for(50_000, 4096, floor=8) == 13
    assert _blocks_for(150_000, 4096, floor=8) == 37

    from museum_image_etl_gridfs_spark.operators.ann import _sub_blocks_for

    # jaccard joins the memory ceiling with a parallelism floor
    # (4 cells/core): memory-only picked subs=2 at sf1 — 60 cells /
    # 32 cores, 35 s where subs=4 ran 4.5 s
    assert _sub_blocks_for(2500, 20, 32, 2048) == 4
    # sf3: both terms agree
    assert _sub_blocks_for(7500, 20, 32, 2048) == 4
    # 100x: the memory ceiling dominates and rows/sub stays bounded
    s = _sub_blocks_for(250_000, 20, 32, 2048)
    assert s >= -(-250_000 // 2048) and 250_000 / s <= 2048
    # tiny blocks never split past their own row count
    assert _sub_blocks_for(3, 20, 32, 2048) <= 3
    # many blocking keys already give parallelism: floor backs off
    assert _sub_blocks_for(1000, 10_000, 32, 2048) == 2


def test_jaccard_derived_blocks_match_explicit(spark, sf_dir):
    """The adaptive default must be a pure performance knob: derived
    and explicit block counts produce the identical pair set."""
    from museum_image_etl_gridfs_spark.catalog import load
    from museum_image_etl_gridfs_spark.operators.ann import (
        jaccard_pairs_blocked,
    )
    from pyspark.sql import functions as F

    toks = load(spark, "documents", sf_dir).select(
        "doc_id",
        "source",
        F.split(F.trim(F.lower(F.coalesce("text", F.lit("")))), r"\s+").alias(
            "ts"
        ),
    )
    kw = dict(
        id_col="doc_id", tokens_col="ts", block_col="source", threshold=0.5
    )
    derived = {
        tuple(r) for r in jaccard_pairs_blocked(toks, **kw).collect()
    }
    explicit = {
        tuple(r)
        for r in jaccard_pairs_blocked(toks, n_sub_blocks=5, **kw).collect()
    }
    assert derived == explicit and derived


def test_cosine_pairs_matmul_stage_width(spark, sf_dir):
    """VERDICT r10 #1 pin: the CPU-bound numpy matmul stage must run
    defaultParallelism-wide, not inherit the block-count-wide hash
    partitioning of the self-join (task COUNT, not exchange count —
    the SOLO_r10 lesson)."""
    from museum_image_etl_gridfs_spark.catalog import load
    from museum_image_etl_gridfs_spark.operators.ann import (
        cosine_pairs_blocked,
    )

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    out = cosine_pairs_blocked(emb, threshold=0.5, n_blocks=4)
    para = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() >= max(para, 4)
