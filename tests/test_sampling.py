"""weighted_reservoir_sample must equal a numpy A-ES reference with
the same hash-derived uniforms, be weight-proportional in aggregate,
and be invariant to partitioning (the whole point of hashing u)."""

from __future__ import annotations

import hashlib
import math

from museum_image_etl_gridfs_spark.operators.sampling import (
    weighted_reservoir_sample,
)


def _u(doc_id: int, salt: str = "v1") -> float:
    h = hashlib.md5(f"{doc_id}:wrs:{salt}".encode()).hexdigest()[:8]
    return (int(h, 16) + 0.5) / float(1 << 32)


def _brute(rows, n):
    """rows: (id, group, weight). Reference A-ES top-n per group."""
    by_g: dict[str, list] = {}
    for i, g, w in rows:
        by_g.setdefault(g, []).append((math.log(_u(i)) / w, i))
    out = set()
    for g, keyed in by_g.items():
        keyed.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, i) in enumerate(keyed[:n], start=1):
            out.add((i, g, rank))
    return out


def _run(spark, rows, n, parts=None):
    df = spark.createDataFrame(
        [(i, g, w) for i, g, w in rows], "id long, g string, w double"
    )
    if parts:
        df = df.repartition(parts)
    got = weighted_reservoir_sample(
        df, id_col="id", group_col="g", weight="w", n=n
    ).collect()
    return {(r["id"], r["g"], r["wrs_rank"]) for r in got}


def test_matches_reference_implementation(spark):
    rows = [(i, f"g{i % 3}", float(1 + (i * 7) % 13)) for i in range(200)]
    assert _run(spark, rows, 5) == _brute(rows, 5)


def test_partition_invariance(spark):
    rows = [(i, f"g{i % 4}", float(1 + i % 9)) for i in range(120)]
    assert _run(spark, rows, 3, parts=1) == _run(spark, rows, 3, parts=16)


def test_small_groups_return_whole_group(spark):
    rows = [(1, "a", 2.0), (2, "a", 3.0), (3, "b", 1.0)]
    got = _run(spark, rows, 5)
    assert {i for i, _, _ in got} == {1, 2, 3}
    assert {r for i, g, r in got if g == "a"} == {1, 2}


def test_weight_proportional_inclusion(spark):
    # one heavy item among light ones: with w_heavy = 50x w_light,
    # the heavy id must rank first in nearly all of many disjoint
    # groups — a distributional smoke test of the A-ES property.
    rows = []
    for g in range(40):
        rows.append((g * 100, f"g{g}", 50.0))  # heavy
        rows.extend((g * 100 + j, f"g{g}", 1.0) for j in range(1, 10))
    got = _run(spark, rows, 1)
    heavy_wins = sum(1 for i, _, _ in got if i % 100 == 0)
    assert heavy_wins >= 32  # E ≈ 40 * 50/59 ≈ 34
