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
    """The driver verifies a 50-row prefix: sentinels must lead,
    oracle-checkable queries must be ordered by ascending last-green
    driver round so no CORRECTNESS row ages indefinitely, and
    oracle-less queries must sort LAST — the driver can only ever
    emit ``err: no_oracle`` for them, so a prefix slot spent on one
    is wasted (they are golden-pinned + rows-only-swept instead)."""
    from museum_image_etl_gridfs_spark.plans.registry import _SENTINELS
    from museum_image_etl_gridfs_spark.plans.staleness import LAST_CHECKED

    names = list(QUERIES)
    assert names[: len(_SENTINELS)] == list(_SENTINELS) or set(
        names[: len(_SENTINELS)]
    ) == set(_SENTINELS)
    tail = names[len(_SENTINELS):]
    with_oracle = [n for n in tail if QUERIES[n].oracle is not None]
    no_oracle = [n for n in tail if QUERIES[n].oracle is None]
    # every oracle-less query sits behind every oracle-checkable one
    assert tail == with_oracle + no_oracle
    rounds = [LAST_CHECKED.get(n, 0) for n in with_oracle]
    assert rounds == sorted(rounds)
    # brand-new oracle-checkable queries (round 0) must sort first
    new = [n for n in with_oracle if n not in LAST_CHECKED]
    assert with_oracle[: len(new)] == new


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
