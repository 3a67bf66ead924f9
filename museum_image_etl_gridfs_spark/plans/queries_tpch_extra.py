"""Decision-support breadth: the remaining classic TPC-H shapes
(Q4/Q7/Q10/Q11/Q15/Q16/Q19/Q21/Q22 analogues), adapted to the
fixture schema (no partsupp / commitdate / shipmode columns).

These complete the §2.3-§2.4 "ABSENT" rows with the optimizer paths
the earlier files don't yet exercise: EXISTS/NOT-EXISTS with
non-equi correlation (semi/anti joins that carry an extra predicate),
global scalar subqueries de-correlated as broadcast cross-joins,
HAVING against a global aggregate, disjunctive OR-of-ANDs predicate
pushdown, and max-equality self-join on an aggregate.

All pure Catalyst — no UDFs, no collect — each with an exact DuckDB
oracle. Scale posture per query in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    "priority_exists_counts",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("semi-join", "exists", "agg"),
)
def priority_exists_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a non-equi correlated predicate
    (lineitem shipped after the order date), counted per priority.

    The EXISTS is a LEFT SEMI join on orderkey carrying the extra
    ``l_shipdate > o_orderdate`` condition — one shuffle pair on
    orderkey; the date-range filter pushes into the orders scan and
    shrinks the probe side before the shuffle. At 100 TB both sides
    partition on orderkey so the semi join stays a local hash probe
    per partition.
    """
    o = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    hit = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


@query(
    "cross_nation_trade",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                 AS volume
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("multi-join", "broadcast", "agg"),
)
def cross_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year — a five-way join where every dimension (supplier, customer,
    nation×2) broadcasts and only the lineitem⋈orders join shuffles.

    The nation-pair disjunction is applied AFTER the dim joins attach
    both names, but Catalyst infers the single-nation IN-filters onto
    each broadcast side (n_name IN (A,B) twice), so the fact rows
    hitting the shuffle are already restricted to the two nations'
    suppliers/customers. At 100 TB the only exchange is
    lineitem⋈orders on orderkey.
    """
    li = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    n = load(spark, "nation", sf_dir)
    pair = ("NATION_3", "NATION_7")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*pair))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*pair))
    joined = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1])
            )
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _volume().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@query(
    "returned_item_report",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk", "agg"),
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns.

    Aggregate-then-top-k: the groupBy shuffles on the customer grain
    once, then ``orderBy+limit`` compiles to TakeOrderedAndProject
    (per-partition top-20, tiny driver merge — no global sort).
    Tie-broken on c_custkey so the limit boundary is deterministic
    for the oracle hash. Customer broadcasts; lineitem⋈orders is the
    one real shuffle.
    """
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "important_part_values",
    oracle="""
    SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) > (
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.0007 FROM lineitem
    )
    """,
    tags=("subquery", "having", "agg"),
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value exceeds a fraction of the
    GLOBAL total — HAVING against an uncorrelated scalar subquery.

    De-correlated as two aggregates over one scan lineage: the
    per-part aggregate shuffles on partkey; the global total is a
    single-row aggregate broadcast-cross-joined into the HAVING
    filter (no driver collect, no recomputation of the scan at the
    storage layer thanks to exchange reuse). The DECIMAL threshold
    comparison is exact on both engines.
    """
    li = load(spark, "lineitem", sf_dir).select(
        "l_partkey", F.col("l_extendedprice").cast(_DEC).alias("price_dec")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("price_dec").alias("val_dec"))
    total = li.agg(
        (F.sum("price_dec") * F.lit(0.0007)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val_dec") > F.col("threshold"))
        .select("l_partkey", F.col("val_dec").cast("double").alias("part_value"))
    )


@query(
    "top_revenue_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
               AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    tags=("subquery", "max-equality", "join"),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving maximum quarterly
    revenue — equality against MAX over a derived aggregate (ties
    kept, unlike a LIMIT 1).

    The revenue CTE is computed once; its global MAX is a single-row
    broadcast joined back as a filter. DECIMAL equality is exact, so
    cross-engine max-matching is bit-stable. The supplier dim
    broadcasts onto the 100-row aggregate output.
    """
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_volume()).alias("total_rev"))
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    s = load(spark, "supplier", sf_dir)
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@query(
    "supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type
    """,
    tags=("anti-join", "count-distinct", "agg"),
)
def supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per brand/type,
    excluding a supplier denylist (NOT IN → broadcast anti-join; the
    denylist has no NULL keys, so anti-join ≡ NOT IN here).

    COUNT(DISTINCT) expands to a two-phase aggregate: partial
    distinct on (brand,type,suppkey), then the final count — both
    phases map-side combinable. The part filter (brand + size IN)
    pushes to the parquet scan of the broadcast side.
    """
    p = load(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load(spark, "lineitem", sf_dir).join(
        F.broadcast(bad), F.col("l_suppkey") == bad["s_suppkey"], "left_anti"
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "disjunctive_bracket_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("disjunction", "pushdown", "join"),
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs mixing both join sides.

    The disjunction references part AND lineitem columns, so it can
    only evaluate post-join — but Catalyst derives the single-side
    implications (brand IN (...) AND size <= 15 on part; quantity
    BETWEEN 1 AND 30 on lineitem) and pushes those into each scan,
    shrinking the broadcast build side and the probe input before the
    residual OR runs. That derived-pushdown behavior is what this
    query pins.
    """
    li = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir)
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    brackets = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(brackets).agg(
        F.sum(_volume()).cast("double").alias("revenue")
    )


@query(
    "sole_return_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
    tags=("semi-join", "anti-join", "exists"),
)
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY one on a
    multi-supplier finalized order to have their line returned —
    EXISTS and NOT EXISTS with an extra non-equi correlation
    (``l2.l_suppkey <> l1.l_suppkey``).

    Planned as a LEFT SEMI then LEFT ANTI join, both on orderkey with
    the inequality as a join residual. All three lineitem branches
    and orders shuffle on orderkey — at scale AQE coalesces these
    into one co-partitioned exchange lineage; the supplier dim
    broadcasts at the end onto the aggregated grain.
    """
    s = load(spark, "supplier", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    li = load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").withColumnsRenamed(
        {"l_orderkey": "k1", "l_suppkey": "sk1"}
    ).drop("l_returnflag")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(o, F.col("k1") == o["o_orderkey"], "left_semi")
        .join(
            l2,
            (F.col("k1") == F.col("k2")) & (F.col("sk1") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k1") == F.col("k3")) & (F.col("sk1") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("sk1") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@query(
    "idle_customer_balance",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
    )
    GROUP BY c_mktsegment
    """,
    tags=("anti-join", "subquery", "agg"),
)
def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    recent (1999+) orders, summed per market segment.

    Two de-correlations in one plan: the global AVG is a single-row
    broadcast cross-join (not a driver collect), and NOT EXISTS is a
    LEFT ANTI against the orders custkey projection. The AVG
    comparison is float on both engines but never on a hash boundary
    decision — it gates row membership identically since both
    compute the same double from the same values.
    """
    c = load(spark, "customer", sf_dir)
    cutoff = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o_keys = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, c["c_custkey"] == o_keys["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )
