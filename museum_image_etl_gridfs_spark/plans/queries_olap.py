"""Classic OLAP shapes completing the engine surface: correlated
scalar subqueries, pivot, exact percentiles, time-bucketed trends.
All pure Catalyst — no UDFs — with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query


@query(
    "small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type = 'MEDIUM'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("subquery", "join", "agg"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) gating a fact filter.

    Spark plans the correlated aggregate as a de-correlated join
    against a pre-aggregated per-key relation — expressed here
    directly as that join so the plan is explicit: one aggregate over
    lineitem (shuffle on partkey), broadcast of the filtered part
    dimension, no per-row subquery execution anywhere.
    """
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).filter(
        F.col("p_type") == "MEDIUM"
    ).select("p_partkey")
    per_part = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(per_part, ["l_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "returnflag_pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS flag_a,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'N') AS BIGINT) AS flag_n,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS flag_r
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("pivot", "agg"),
)
def returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: return-flag columns per line status. Explicit pivot
    values keep the plan a single-pass aggregate (no extra pass to
    discover the value domain)."""
    li = load(spark, "lineitem", sf_dir)
    wide = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "l_linestatus",
        F.coalesce(F.col("A"), F.lit(0)).alias("flag_a"),
        F.coalesce(F.col("N"), F.lit(0)).alias("flag_n"),
        F.coalesce(F.col("R"), F.lit(0)).alias("flag_r"),
    )


@query(
    "price_percentiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE)  AS p50,
           CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE) AS p95,
           CAST(MAX(o_totalprice) AS DOUBLE)                 AS p_max
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("percentile", "agg"),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: both linear-interpolation on the sorted set).
    Exact percentile sorts within groups — fine at dimension-key
    cardinality; for high-cardinality measures at 100 TB switch to
    ``percentile_approx`` (t-digest, mergeable partials)."""
    o = load(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        F.max("o_totalprice").alias("p_max"),
    )


_Q6_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query(
    "forecast_revenue_change",
    oracle=_Q6_SQL,
    tags=("sql-api", "agg", "filter"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape through the SQL API end-to-end: the engine
    registers its catalog as views and executes the EXACT oracle text
    with spark.sql — proving a user of the reference could bring
    plain ANSI SQL and run it unchanged. All four predicates push
    into the Parquet scan."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


@query(
    "monthly_revenue_trend",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(18,2))))
                OVER (ORDER BY date_trunc('month', o_orderdate)
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cumulative_revenue
    FROM orders
    GROUP BY month
    """,
    tags=("date", "window", "agg"),
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc month buckets + cumulative window over the
    aggregate — the standard reporting-trend shape. The cumulative
    sum runs over ~tens of month rows (post-aggregation), so the
    unpartitioned window is driver-scale-safe."""
    from pyspark.sql import Window

    o = load(spark, "orders", sf_dir)
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        "n_orders",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("cumulative_revenue"),
    )
