"""Query registry.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers a named query here: a DataFrame builder
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, an exact
DuckDB oracle. The driver hashes both sides at sf0.01
(order-insensitive), so builders alias every computed column to match
the oracle exactly.

Cross-engine determinism rules used throughout the query modules:
- money aggregates go through DECIMAL (exact associative sum) and are
  cast to DOUBLE at the end — identical bits on both engines,
  independent of partitioning/order;
- every aggregate/computed column is aliased identically on both
  sides;
- DuckDB ``SUM(int)`` returns HUGEINT and is always cast to BIGINT;
- no ORDER BY dependence — the driver compare is order-insensitive,
  LIMIT queries pin a total order first.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .staleness import LAST_CHECKED

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

#: query modules loaded by :func:`all_queries`
_QUERY_MODULES = (
    "museum_image_etl_gridfs_spark.plans.queries_core",
    "museum_image_etl_gridfs_spark.plans.queries_pipeline",
    "museum_image_etl_gridfs_spark.plans.queries_text",
    "museum_image_etl_gridfs_spark.plans.queries_dedup",
    "museum_image_etl_gridfs_spark.plans.queries_vector",
    "museum_image_etl_gridfs_spark.plans.queries_events",
    "museum_image_etl_gridfs_spark.plans.queries_images",
    "museum_image_etl_gridfs_spark.plans.queries_joins",
    "museum_image_etl_gridfs_spark.plans.queries_olap",
    "museum_image_etl_gridfs_spark.plans.queries_tpch_extra",
    "museum_image_etl_gridfs_spark.plans.queries_tpch_close",
    "museum_image_etl_gridfs_spark.plans.queries_traindata",
    "museum_image_etl_gridfs_spark.plans.queries_quality",
    "museum_image_etl_gridfs_spark.plans.queries_profile",
    "museum_image_etl_gridfs_spark.plans.queries_funnel",
    "museum_image_etl_gridfs_spark.plans.queries_analytics",
    "museum_image_etl_gridfs_spark.plans.queries_stats",
)


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator registering a named query with its oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


#: prior-round greens deliberately re-pinned FIRST in the verified
#: prefix as regression sentinels — one per fixture-sensitive table
#: family (lineitem/orders core, events batch, events streaming,
#: documents, embeddings), so a driver fixture change (e.g. the
#: round-2 events NANOS->MICROS/NTZ rewrite) flips a CORRECTNESS row
#: red instead of only surfacing as a bench crash.
_SENTINELS = (
    "flagship_dup_groups",
    "user_sessions",
    "stream_tumbling_1h",
    "quality_flags",
    "cosine_topk",
)


def _priority(q: Query) -> tuple[int, int]:
    """Sort key rotating the STALEST queries into the driver prefix.

    The driver verifies a fixed-budget prefix of the registry (50
    rows), so ordering IS the verification policy:

    - sentinels first — new-query waves can never crowd them out;
    - then ascending last-green-driver-round from the generated
      ``staleness.LAST_CHECKED`` table (``tools/gen_staleness.py``),
      with never-GREEN queries at round 0, ahead of everything
      previously green. (A red row does not advance a previously
      green query's round: gen_staleness records only green rounds,
      so the query keeps its older round and stays near the front —
      the rotation self-corrects without a separate red state.);
    - oracle-less queries LAST: the driver can only ever emit
      ``err: no_oracle`` for them (it cannot hash-check a query with
      no DuckDB SQL), so a prefix slot spent on one is wasted — they
      are verified by full-result goldens (``tests/test_goldens.py``)
      and rows-only sweeps instead;
    - registration order breaks ties (stable sort).

    With a ~190-query registry and a 50-row budget this re-verifies
    every oracle-checkable query at least once every ~4 rounds, so no
    driver row ages indefinitely (round 4's max age was 3; the
    rotation keeps it there).
    """
    if q.name in _SENTINELS:
        return (0, -1, 0)
    no_oracle = 1 if q.oracle is None else 0
    return (no_oracle, LAST_CHECKED.get(q.name, 0), 0)


def all_queries() -> dict[str, Query]:
    """Import all query modules and return the full registry.

    Ordered so the driver's prefix-limited correctness pass spends its
    budget on the stalest driver rows (sentinels first, then ascending
    last-green round; registration order is preserved within each
    priority band).
    """
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    ordered = sorted(_REGISTRY.values(), key=_priority)
    return {q.name: q for q in ordered}
