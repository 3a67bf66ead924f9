"""Runtime filtering: bloom-pruned joins and dynamic partition pruning.

The two Catalyst mechanisms that matter most for selective joins at
100 TB, neither of which the reference engine has (it re-reads the
full collection per query; SURVEY.md §4):

- **Runtime bloom filters** — for a shuffle join where one side
  carries a selective filter, Catalyst builds a bloom filter over the
  filtered side's join keys and injects ``might_contain`` into the
  OTHER side's scan filter. A 100 TB fact scan feeding a join that
  keeps 1% of orders then ships ~1% of the rows into the shuffle
  instead of all of them. Conf-driven (not a per-query API):
  creation side must be below ``creationSideThreshold`` (default
  10 MB) and the pruned scan above
  ``applicationSideScanSizeThreshold`` (default 10 GB — cluster-real;
  tests drop it to 0 to demonstrate at fixture scale).

- **Dynamic partition pruning (DPP)** — when the fact table is
  PARTITIONED by the join column, the dim side's filter result is
  evaluated first and the fact scan reads only matching partitions
  (``dynamicpruningexpression`` in PartitionFilters). This is the
  scan-skipping complement to the bloom filter's shuffle-skipping:
  bloom prunes rows inside files; DPP prunes whole directories.
  Preconditions that silently disable it: the dim filter must be a
  shape Catalyst deems "likely selective" (equality / IN / LIKE — a
  bare boolean column is not), the dim must be a stats-bearing
  relation (a table, not an in-memory ExistingRDD), and with the
  default ``reuseBroadcastOnly`` the dim side must broadcast.

Both are *free* once the plan is declarative and the layout is right;
this module provides the layout writer, a scoped-conf helper so a
single query can opt in without mutating session state, and a plan
reporter that tests (and operators in production) use to verify the
filters actually fired — a silent fallback to a full scan is exactly
the regression a 1000-executor cluster cannot afford.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

_UNSET = object()


@contextlib.contextmanager
def session_confs(spark: SparkSession, **confs: str) -> Iterator[None]:
    """Set SQL confs for a scope, restoring prior values on exit.

    Catalyst reads confs at planning time (which is lazy), so trigger
    planning — ``.explain()``, an action, or a write — INSIDE the
    scope. Keys use ``__`` for ``.`` if passed as kwargs, or pass a
    prepared dict via ``**{"spark.sql....": "..."}``.
    """
    prior: dict[str, object] = {}
    for key, value in confs.items():
        key = key.replace("__", ".")
        try:
            prior[key] = spark.conf.get(key)
        except Exception:
            prior[key] = _UNSET
        spark.conf.set(key, value)
    try:
        yield
    finally:
        for key, value in prior.items():
            if value is _UNSET:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, value)


def bloom_join_confs(
    *,
    application_side_scan_threshold: str = "10GB",
    creation_side_threshold: str = "10MB",
    expected_items: int | None = None,
) -> dict[str, str]:
    """Conf dict enabling runtime bloom-filter join pruning.

    Defaults are the cluster-real thresholds: build a bloom filter
    only when the filtered (creation) side is small enough to
    aggregate cheaply and the scan it would prune is big enough to be
    worth it. Tests pass ``application_side_scan_threshold="0"`` to
    force injection at fixture scale.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": application_side_scan_threshold,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": creation_side_threshold,
    }
    if expected_items is not None:
        confs["spark.sql.optimizer.runtime.bloomFilter.expectedNumItems"] = str(
            expected_items
        )
    return confs


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    *,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (``col=value/`` dirs).

    The storage-side half of DPP and static partition pruning: any
    later filter or join on ``partition_cols`` skips non-matching
    directories without opening a file. Choose low-cardinality,
    frequently-filtered columns (date, source, language) — thousands
    of partitions, not millions (small-file explosion).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def runtime_filter_report(df: DataFrame) -> dict[str, bool]:
    """Which runtime filters made it into ``df``'s physical plan.

    ``{"bloom": did a might_contain land on a scan-side condition,
    "dpp": does any scan carry a dynamicpruningexpression}`` — the
    assertion surface for plan tests and for production jobs that
    want to fail fast when a layout/threshold change silently
    disables pruning.
    """
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )
    return {
        "bloom": "might_contain" in plan,
        "dpp": "dynamicpruningexpression" in plan,
    }
