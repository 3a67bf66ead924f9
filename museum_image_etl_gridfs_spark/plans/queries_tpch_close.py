"""The final six classic decision-support shapes (TPC-H Q2/Q8/Q9/
Q12/Q14/Q20 analogues), completing the full 22-query deck.

The fixture schema has no ``partsupp`` table and no
``l_shipmode/l_commitdate/l_receiptdate`` columns, so — as with
`queries_tpch_extra` — each shape is re-grounded on the columns that
exist while preserving the optimizer path the original exercises:

- Q2  → correlated MIN subquery de-correlated as a window over ONE
        exchange (repartition on partkey satisfies both the
        (partkey,suppkey) aggregate and the partkey window).
- Q8  → conditional-aggregate market share over a 7-table join where
        every dimension broadcasts.
- Q9  → LIKE-filtered profit expression aggregated by nation × year.
- Q12 → fact-fact join with interval date arithmetic and a
        priority CASE pivot.
- Q14 → single-value conditional ratio (CASE inside SUM, exact
        DECIMAL numerator/denominator, double division at the end).
- Q20 → nested aggregate threshold feeding a double semi-join chain.

All pure Catalyst — no UDFs, no collect — each with an exact DuckDB
oracle. Cross-engine determinism follows the registry rules: DECIMAL
money, identical aliases, BIGINT counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

_DEC = "decimal(18,2)"


def _volume() -> F.Column:
    """Exact revenue term: price * (1 - discount) in DECIMAL."""
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )


@query(
    "min_cost_supplier",
    oracle="""
    WITH eur_supp AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region g ON g.r_regionkey = n.n_regionkey
        WHERE g.r_name = 'EUROPE'
    ), offers AS (
        SELECT l.l_partkey, l.l_suppkey,
               MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN eur_supp e ON e.s_suppkey = l.l_suppkey
        WHERE p.p_type = 'LARGE' AND p.p_size IN (10, 20, 30)
        GROUP BY l.l_partkey, l.l_suppkey
    ), ranked AS (
        SELECT o.*, MIN(cost) OVER (PARTITION BY l_partkey) AS best
        FROM offers o
    )
    SELECT r.l_partkey AS p_partkey, e.s_suppkey, e.s_name, e.n_name,
           CAST(e.s_acctbal AS DOUBLE) AS s_acctbal,
           CAST(r.cost AS DOUBLE) AS min_cost
    FROM ranked r
    JOIN eur_supp e ON e.s_suppkey = r.l_suppkey
    WHERE r.cost = r.best
    """,
    tags=("window", "subquery", "multi-join"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the European
    supplier(s) offering the minimum cost. The reference schema has no
    partsupp, so the "offer" is the minimum extended price a supplier
    ever shipped the part at (exact DECIMAL — MIN needs no summation,
    so doubles would also be safe, but DECIMAL keeps the rule uniform).

    The correlated ``cost = (SELECT MIN ...)`` subquery de-correlates
    into a window MIN — and the whole thing runs on ONE exchange: an
    explicit ``repartition(l_partkey)`` satisfies the
    (partkey, suppkey) aggregate (partkey is a subset of the grouping
    key, so rows for a group are already co-located) AND the
    partkey-partitioned window above it. Both dimension filters
    (part type/size, EUROPE suppliers) broadcast and prune the fact
    BEFORE the shuffle. At 100 TB: one fact shuffle on partkey, tie
    rows (multiple suppliers at the min) preserved exactly as Q2
    requires.
    """
    p = (
        load(spark, "part", sf_dir)
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").isin(10, 20, 30))
        .select("p_partkey")
    )
    eur = (
        load(spark, "nation", sf_dir)
        .join(
            F.broadcast(load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(eur), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", F.col("l_extendedprice").cast(_DEC).alias("price_dec")
    )
    offers = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .drop("s_suppkey")
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("price_dec").alias("cost"))
    )
    best = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("best", F.min("cost").over(best))
        .filter(F.col("cost") == F.col("best"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("cost").cast("double").alias("min_cost"),
        )
    )


@query(
    "nation_market_share",
    oracle="""
    SELECT o_year,
           CAST(CAST(SUM(nation_vol) AS DOUBLE) / CAST(SUM(vol) AS DOUBLE)
                AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                 AS vol,
               CASE WHEN n1.n_name = 'NATION_5'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END AS nation_vol
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region g   ON g.r_regionkey = n2.n_regionkey
        WHERE g.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
    tags=("multi-join", "broadcast", "conditional-agg"),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of ECONOMY-part revenue sold
    into AMERICA, by order year — a seven-table join whose only real
    exchange is lineitem⋈orders on orderkey.

    Both the numerator and denominator are exact DECIMAL sums (the
    CASE keeps DECIMAL type); the division happens once per year in
    DOUBLE, bit-identical across engines. part, supplier, nation×2,
    region and (at this SF) customer all broadcast; the part filter
    prunes the fact before the shuffle. At 100 TB customer outgrows
    broadcast range — the plan degrades gracefully to one extra
    shuffle pair on custkey, everything else unchanged.
    """
    li = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n1 = load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderdate")
    amer = (
        load(spark, "nation", sf_dir)
        .join(
            F.broadcast(load(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("n2_key"))
    )
    c = (
        load(spark, "customer", sf_dir)
        .join(F.broadcast(amer), F.col("c_nationkey") == F.col("n2_key"))
        .select("c_custkey")
    )
    vol = _volume().alias("vol")
    nation_vol = (
        F.when(F.col("supp_nation") == "NATION_5", _volume())
        .otherwise(F.lit(0).cast(_DEC))
        .alias("nation_vol")
    )
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(F.year("o_orderdate").cast("long").alias("o_year"), vol, nation_vol)
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum("nation_vol").cast("double") / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@query(
    "product_type_profit",
    oracle="""
    SELECT n_name, o_year, CAST(SUM(amount) AS DOUBLE) AS profit
    FROM (
        SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
               - CAST('0.90' AS DECIMAL(18,2)) * CAST(p.p_retailprice AS DECIMAL(18,2))
                 * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%red%'
    )
    GROUP BY n_name, o_year
    """,
    tags=("multi-join", "like", "agg"),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on red parts by supplier nation × order
    year. No partsupp → unit cost is modeled as 90% of the part's
    retail price, so ``amount = price*(1-disc) - 0.90*retail*qty``.

    The whole amount expression stays in DECIMAL (multiplication
    widens scale exactly; subtraction aligns scales exactly), summed
    exactly, cast to double once per group — bit-identical across
    engines regardless of partitioning. The LIKE filter prunes part
    BEFORE its broadcast; supplier/nation broadcast; the one shuffle
    is lineitem⋈orders on orderkey, then a small agg shuffle on
    (nation, year). At 100 TB this is the canonical star-join plan.
    """
    li = load(spark, "lineitem", sf_dir)
    p = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    amount = (
        _volume()
        - F.lit("0.90").cast(_DEC)
        * F.col("p_retailprice").cast(_DEC)
        * F.col("l_quantity").cast(_DEC)
    ).alias("amount")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("n_name", F.year("o_orderdate").cast("long").alias("o_year"), amount)
        .groupBy("n_name", "o_year")
        .agg(F.sum("amount").cast("double").alias("profit"))
    )


@query(
    "late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
    tags=("join", "conditional-agg", "date-arith"),
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments (no commit/receipt dates in
    this schema, so "late" = shipped more than 60 days after the
    order date) pivoted into high/low-priority counts per line
    status.

    The lateness predicate is a non-equi residual on the fact-fact
    join — the orderkey equi-pair shuffles, the interval comparison
    evaluates during the probe, codegen'd. The year filter on
    l_shipdate pushes to the parquet scan and bounds the shuffle.
    Counts are plain codegen CASE sums, map-side combined down to
    ≤ |linestatus| rows before the final 2-row exchange.
    """
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li["l_orderkey"] == o["o_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_count"),
        )
    )


@query(
    "promo_revenue_ratio",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                       AS DOUBLE)
           AS DOUBLE) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    tags=("join", "conditional-agg", "scalar"),
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts — a single-row conditional ratio.

    Numerator and denominator are exact DECIMAL sums over the same
    rows (the CASE preserves DECIMAL); the ratio is computed once in
    DOUBLE. The month filter pushes to the lineitem scan (min/max
    row-group pruning does most of the work at scale); part
    broadcasts carrying only (partkey, type). The aggregate is
    map-side combined to one row per task before a single-row final
    exchange — no wide shuffle anywhere.
    """
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load(spark, "part", sf_dir).select("p_partkey", "p_type")
    promo_vol = (
        F.when(F.col("p_type") == "PROMO", _volume())
        .otherwise(F.lit(0).cast(_DEC))
        .alias("promo_vol")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(promo_vol, _volume().alias("vol"))
        .agg(
            (
                F.lit(100.0)
                * F.sum("promo_vol").cast("double")
                / F.sum("vol").cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "excess_supply_candidates",
    oracle="""
    WITH shipped AS (
        SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'red %'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE EXISTS (SELECT 1 FROM shipped sh
                  WHERE sh.l_suppkey = s.s_suppkey AND sh.qty > 40)
    """,
    tags=("semi-join", "subquery", "having"),
)
def excess_supply_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved a large volume of any red
    part in 1997 (no partsupp availability column, so the threshold
    is on shipped quantity: some (supplier, part) total > 40 units).

    The nested aggregate builds per-(suppkey, partkey) totals — the
    part LIKE filter broadcasts and prunes lineitem before that
    shuffle, and the shipdate year pushes to the scan. The HAVING
    threshold then collapses to a distinct supplier set that drives a
    LEFT SEMI join against supplier. Quantities are integral doubles
    (exact under summation well past 2^53), so the sum is
    order-insensitive. At 100 TB the semi-join side is tiny (distinct
    qualifying suppliers) and broadcasts back against the supplier
    dimension — no supplier-side shuffle at all.
    """
    p = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    qualifying = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(qualifying), s["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
