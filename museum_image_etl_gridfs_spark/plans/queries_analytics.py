"""Advanced analytics operators added round 3, session 2: sketch-based
heavy hitters, distributed skyline, pandas UDAF surface, table
fingerprints, argmin/argmax OHLC bars, blocked fuzzy entity
resolution, and iterative PageRank — each with an exact DuckDB oracle.

The reference (a 501-LoC pymongo ETL) has none of these; they complete
the large-scale training-data/analytics surface SURVEY.md §2 scopes
for the Spark engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.sketches import cms_heavy_hitters, tokens_of
from ..operators.skyline import skyline
from ..partitioning import spread
from .registry import query

#: heavy-hitter share-of-corpus threshold (3% of all tokens)
_HH_FRAC = 0.03


@query(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS item
        FROM documents
        WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    f AS (SELECT item, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY 1)
    SELECT item, freq
    FROM f
    WHERE freq >= CAST(ceil({_HH_FRAC} * (SELECT sum(freq) FROM f)) AS BIGINT)
    """,
    tags=("sketch", "heavy-hitters", "mapInPandas", "documents"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters via count-min sketch + exact verify
    (operators/sketches.py): tokens holding ≥ 3% of all token
    occurrences.

    The corpus is never shuffled — each partition emits a tiny CMS
    partial and its pigeonhole-safe local candidates; only surviving
    candidates are recounted exactly (broadcast semi-join), so the
    output is exact and the oracle can hash-match it.
    """
    docs = spread(load(spark, "documents", sf_dir), "doc_id")
    toks = docs.select(
        F.explode_outer(tokens_of(F.col("text"))).alias("item")
    ).filter(F.col("item").isNotNull())
    return cms_heavy_hitters(toks, "item", _HH_FRAC)


@query(
    "pareto_frontier_parts",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice, p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
    tags=("skyline", "pareto", "mapInPandas"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: cheapest-for-their-size (minimize
    p_retailprice, maximize p_size), via the two-phase distributed
    skyline (operators/skyline.py).

    The oracle is the quadratic NOT EXISTS; the Spark plan is linear
    per partition (local SFS skyline) plus one tiny global pass —
    at 100 TB the fact never shuffles, only per-partition frontiers
    move.
    """
    part = spread(
        load(spark, "part", sf_dir).select(
            "p_partkey", "p_name", "p_retailprice", "p_size"
        ),
        "p_partkey",
    )
    return skyline(part, minimize=["p_retailprice"], maximize=["p_size"])
