"""Table catalog over the driver-provided Parquet fixtures.

The reference's "catalog" is five implicit MongoDB collections
(SURVEY.md §1.1); here every table is an explicit Parquet scan so
Catalyst gets pushdown/pruning for free. ``load`` is lazy — a scan
node, not a materialization (the reference's ``list(find({}))`` full
materialization at ``src/transform_load.py:25`` is the anti-pattern
we explicitly do not reproduce).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor.
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Lazy Parquet scan of one fixture table.

    ``events.ts`` is written as Parquet TIMESTAMP(NANOS), which the
    Spark vectorized reader rejects; we read it as raw int64
    (``nanosAsLong``) and convert to a microsecond timestamp —
    integer division truncates exactly like DuckDB's ns→us cast.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    sf_dir = sf_dir or sf_dir_from_env()
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # `ts div 1000` is exact long division; `ts / 1000` would
            # round through a double (1 µs off near .9995 boundaries)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, name, sf_dir).createOrReplaceTempView(name)
