"""Cursor-chain UDTF source: walk-to-exhaustion, fan-out via LATERAL,
page budget, and broken-chain error rows (sources/paginated.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.sources.paginated import (
    canned_transport,
    make_paginated_fetch_udtf,
)


def _two_chain_pages() -> dict:
    # chain A: 2 pages of 2 items; chain B: 1 page then a dead cursor
    return {
        "http://api.test/a?cursor=a0": (
            200,
            {"items": [{"id": 1}, {"id": 2}], "next": "a1"},
        ),
        "http://api.test/a?cursor=a1": (
            200,
            {"items": [{"id": 3}], "next": None},
        ),
        "http://api.test/b?cursor=b0": (
            200,
            {"items": [{"id": 10}], "next": "b-broken"},
        ),
    }


def test_lateral_fanout_walks_each_chain(spark):
    udtf_cls = make_paginated_fetch_udtf(canned_transport(_two_chain_pages()))
    spark.udtf.register("fetch_pages_test", udtf_cls)
    seeds = spark.createDataFrame(
        [("a", "http://api.test/a", "a0"), ("b", "http://api.test/b", "b0")],
        "source string, url string, cursor string",
    )
    seeds.createOrReplaceTempView("seeds_test")
    rows = spark.sql(
        "SELECT s.source, p.* FROM seeds_test s, "
        "LATERAL fetch_pages_test(s.url, s.cursor, 100) p"
    ).collect()

    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    a_items = [json.loads(r.item)["id"] for r in by_source["a"] if r.status == 200]
    assert sorted(a_items) == [1, 2, 3]
    assert [r.page for r in sorted(by_source["a"], key=lambda r: (r.page, r.item_idx))] == [0, 0, 1]

    # chain B: one good item, then the 404 terminal error row
    b = sorted(by_source["b"], key=lambda r: (r.page, r.item_idx))
    assert [r.status for r in b] == [200, 404]
    err = b[-1]
    assert err.item_idx == -1 and err.page == 1


def test_page_budget_caps_chain(spark):
    # a self-looping cursor would walk forever without the budget
    pages = {
        "http://api.test/loop?cursor=x": (
            200,
            {"items": [{"n": 0}], "next": "x"},
        ),
    }
    udtf_cls = make_paginated_fetch_udtf(canned_transport(pages))
    spark.udtf.register("fetch_pages_loop", udtf_cls)
    rows = spark.sql(
        "SELECT * FROM fetch_pages_loop('http://api.test/loop', 'x', 5)"
    ).collect()
    assert len(rows) == 5
    assert {r.status for r in rows} == {200}


def test_null_seed_yields_nothing(spark):
    udtf_cls = make_paginated_fetch_udtf(canned_transport({}))
    spark.udtf.register("fetch_pages_null", udtf_cls)
    rows = spark.sql(
        "SELECT * FROM fetch_pages_null(NULL, 'c0', 10)"
    ).collect()
    assert rows == []
