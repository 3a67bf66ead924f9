"""Training-shard layout: python-md5 parity, determinism, layout
shape on disk, and hash-order decorrelation from source order."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.shards import (
    assign_shards,
    write_training_shards,
)


def _py_pos(key, salt="v1"):
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)


def test_shard_pos_matches_python_md5(spark, sf_dir):
    rows = (
        assign_shards(load(spark, "documents", sf_dir), "doc_id", 16)
        .select("doc_id", "shard_pos", "shard")
        .limit(100)
        .collect()
    )
    for r in rows:
        assert r.shard_pos == _py_pos(r.doc_id)
        assert r.shard == _py_pos(r.doc_id) % 16


def test_assignment_stable_under_repartitioning(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    a = sorted(
        (r.doc_id, r.shard)
        for r in assign_shards(docs, "doc_id", 8).select("doc_id", "shard").collect()
    )
    b = sorted(
        (r.doc_id, r.shard)
        for r in assign_shards(docs.repartition(7), "doc_id", 8)
        .select("doc_id", "shard")
        .collect()
    )
    assert a == b


def test_salt_reshuffles_assignment(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    a = {r.doc_id: r.shard for r in assign_shards(docs, "doc_id", 16).collect()}
    b = {
        r.doc_id: r.shard
        for r in assign_shards(docs, "doc_id", 16, salt="v2").collect()
    }
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > len(a) * 0.8  # ~15/16 expected to move


def test_written_layout_one_dir_per_shard_sorted(spark, sf_dir, tmp_path):
    docs = load(spark, "documents", sf_dir)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", 4)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(4)]
    # within each shard file set, rows come back in shard_pos order
    for k in range(4):
        part = spark.read.parquet(f"{path}/shard={k}")
        ids = [r.doc_id for r in part.collect()]
        assert ids == [
            r.doc_id
            for r in part.orderBy("shard_pos", "doc_id").collect()
        ]
    total = spark.read.parquet(path).count()
    assert total == docs.count()


def test_hash_order_decorrelated_from_source_order(spark, sf_dir):
    """Spearman-ish check: ordering by shard_pos must not preserve
    doc_id order (the whole point of the pseudo-random shuffle)."""
    docs = load(spark, "documents", sf_dir).limit(200)
    ordered = (
        assign_shards(docs, "doc_id", 1)
        .orderBy("shard_pos")
        .select("doc_id")
        .collect()
    )
    ids = [r.doc_id for r in ordered]
    asc_runs = sum(1 for i in range(1, len(ids)) if ids[i] > ids[i - 1])
    # a preserved order would give ~len runs; random gives ~half
    assert asc_runs < len(ids) * 0.65
