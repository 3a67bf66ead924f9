"""Z-order layout tests: bit-interleave correctness against a python
reference, quantitative two-dimensional locality, and on-disk file
envelopes after write_zordered."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.operators.layout import (
    scaled_zorder_key2,
    write_zordered,
    zorder_key2,
)


def _py_spread16(v: int) -> int:
    x = v & 0xFFFF
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        x = (x | (x << shift)) & mask
    return x


def _py_z(x: int, y: int) -> int:
    return _py_spread16(x) | (_py_spread16(y) << 1)


def test_zorder_key_matches_python_reference(spark):
    pairs = [(i * 37 % 65536, i * 101 % 65536) for i in range(200)]
    pairs += [(0, 0), (65535, 65535), (1, 0), (0, 1), (65536 + 5, 3)]
    df = spark.createDataFrame(pairs, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key2("x", "y").alias("z")).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == _py_z(x, y), (x, y)


def test_zorder_clusters_both_dimensions(spark, sf_dir):
    """Chunks of the z-sorted table must have narrow envelopes on BOTH
    keys; a single-column sort gives narrow envelopes on one and
    full-range on the other."""
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    rows = (
        li.withColumn("z", scaled_zorder_key2(li, "l_partkey", "l_suppkey"))
        .orderBy("z")
        .collect()
    )
    n_chunks = 16
    size = max(1, len(rows) // n_chunks)
    pk_all = [r["l_partkey"] for r in rows]
    sk_all = [r["l_suppkey"] for r in rows]
    pk_range = max(pk_all) - min(pk_all) or 1
    sk_range = max(sk_all) - min(sk_all) or 1

    def mean_span(vals_key):
        spans = []
        for i in range(0, len(rows), size):
            chunk = rows[i : i + size]
            vs = [r[vals_key] for r in chunk]
            spans.append(max(vs) - min(vs))
        return sum(spans) / len(spans)

    # both dimensions' mean chunk envelope well under the full range
    assert mean_span("l_partkey") / pk_range < 0.5
    assert mean_span("l_suppkey") / sk_range < 0.5


def test_write_zordered_file_envelopes(spark, sf_dir, tmp_path):
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    out = str(tmp_path / "zordered")
    write_zordered(li, out, "l_partkey", "l_suppkey", n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("l_partkey").alias("pk_lo"), F.max("l_partkey").alias("pk_hi"),
            F.min("l_suppkey").alias("sk_lo"), F.max("l_suppkey").alias("sk_hi"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    pk_range = (stats[1] - stats[0]) or 1
    sk_range = (stats[3] - stats[2]) or 1
    pk_frac = sum((r["pk_hi"] - r["pk_lo"]) / pk_range for r in per_file) / len(per_file)
    sk_frac = sum((r["sk_hi"] - r["sk_lo"]) / sk_range for r in per_file) / len(per_file)
    # every file covering the full range on a key means NO pruning on
    # it; z-order must leave meaningful envelopes on both keys
    assert pk_frac < 0.75, pk_frac
    assert sk_frac < 0.75, sk_frac
