"""Registry + driver-contract smoke: every registered query builds a
DataFrame at sf0.001 with a stable, well-formed schema; oracle SQL
parses in DuckDB. (Full value comparison runs in
tools/check_correctness.py at sf0.01 — this is the fast gate.)
"""

from __future__ import annotations

import duckdb
import pytest

from museum_image_etl_gridfs_spark.catalog import TABLES
from museum_image_etl_gridfs_spark.plans import all_queries

QUERIES = all_queries()


def test_registry_nonempty_and_named():
    assert len(QUERIES) >= 40
    for name, q in QUERIES.items():
        assert q.name == name and q.doc, name


def test_driver_prefix_rotates_stalest_first():
    """The driver verifies a 50-row prefix: sentinels must lead, and
    the rest must be ordered by ascending last-green driver round so
    no query's CORRECTNESS row ages indefinitely."""
    from museum_image_etl_gridfs_spark.plans.registry import _SENTINELS
    from museum_image_etl_gridfs_spark.plans.staleness import LAST_CHECKED

    names = list(QUERIES)
    assert names[: len(_SENTINELS)] == list(_SENTINELS) or set(
        names[: len(_SENTINELS)]
    ) == set(_SENTINELS)
    rounds = [LAST_CHECKED.get(n, 0) for n in names[len(_SENTINELS):]]
    assert rounds == sorted(rounds)
    # every registered query has a staleness entry once it has ever
    # been driver-green; brand-new queries (round 0) must sort first
    new = [n for n in names[len(_SENTINELS):] if n not in LAST_CHECKED]
    assert names[len(_SENTINELS) : len(_SENTINELS) + len(new)] == new


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_builds_and_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.build(spark, sf_dir)
    assert df.columns, name
    assert not any(c.startswith("__") for c in df.columns), name
    assert df.count() >= 0  # executes the plan


def test_oracles_parse_in_duckdb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        cols = [d[0] for d in con.execute(q.oracle).description]
        assert cols, name


def test_driver_entry_contract(spark):
    import __spark_entry__ as E

    qs = E.queries()
    osql = E.oracle_sql()
    assert set(osql) <= set(qs)
    df = E.entry(spark)
    assert df.count() > 0
