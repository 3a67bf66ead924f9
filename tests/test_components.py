"""Connected components: known graphs, convergence, canonical pick."""

from __future__ import annotations

import pytest

from museum_image_etl_gridfs_spark.operators.components import (
    canonical_per_cluster,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_chain_collapses_to_one_component(spark):
    # 1-2, 2-3, 3-4: a dup chain must be ONE cluster
    cc = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {r["vertex"]: r["component"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components(spark):
    cc = connected_components(_edges(spark, [(1, 2), (10, 11), (11, 12), (20, 21)]))
    got = {r["vertex"]: r["component"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    n = 12  # diameter 11 — exercises multiple propagation rounds
    cc = connected_components(_edges(spark, [(i, i + 1) for i in range(n)]))
    comps = {r["component"] for r in cc.collect()}
    assert comps == {0}


def test_canonical_per_cluster(spark):
    cc = connected_components(_edges(spark, [(5, 9), (9, 7), (2, 3)]))
    cans = {
        r["component"]: (r["canonical_vertex"], r["cluster_size"])
        for r in canonical_per_cluster(cc).collect()
    }
    assert cans == {5: (5, 3), 2: (2, 2)}


def test_nonconvergence_guard(spark):
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(8)]), max_iterations=1
        )
