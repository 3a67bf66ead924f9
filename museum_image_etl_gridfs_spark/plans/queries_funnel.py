"""Event-sequence analytics + inverted-index build.

Product-analytics shapes over ``events`` (ordered funnel, weekly
retention cohorts, event-type transition matrix) and a two-pass
inverted-index build over ``documents`` — the aggregation patterns a
training-data / analytics user runs daily that the reference's
row-at-a-time loops could only express by materializing everything
client-side (cf. /root/reference/src/transform_load.py's full-table
cursor iteration).

Scale notes (100 TB):
- funnel: ONE shuffle on ``user_id`` with map-side partial min();
  the final global rollup reduces per-partition partials only.
- retention: the events⇄first-seen join shuffles both sides on
  ``user_id``; the first-seen side is an aggregate over the same key,
  so its Exchange is reused — no extra shuffle.
- transitions: one window shuffle on ``user_id``, then a 25-group agg.
- inverted index: COUNT-FIRST two-pass — postings lists are collected
  only for terms that survive the document-frequency band, so no
  executor ever materializes the posting list of a stopword-class hot
  term; the surviving-term set is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import quality as Q
from ..partitioning import spread
from .registry import query

#: lowercased whitespace word array (mirror of functions/quality.words)
_SQL_WORDS_LOWER = (
    "CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END"
)


@query(
    "event_funnel",
    oracle="""
    WITH u AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'view') AS t_view,
               min(ts) FILTER (WHERE event_type = 'click') AS t_click,
               min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id)
    SELECT CAST(count(t_view) AS BIGINT) AS viewed,
           CAST(count(*) FILTER (WHERE t_click > t_view) AS BIGINT)
               AS clicked_after_view,
           CAST(count(*) FILTER (WHERE t_click > t_view
                                 AND t_purchase > t_click) AS BIGINT)
               AS purchased_full_path
    FROM u
    """,
    tags=("events", "funnel", "extension"),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: users counted at each step
    only if the step's FIRST occurrence follows the previous step's
    first occurrence (strict event-time order, not mere presence).

    NULL comparison semantics do the step gating for free: a user with
    no click has ``t_click > t_view`` evaluate to NULL, which a
    ``count(when(...))`` skips — identical to the oracle's FILTER.
    """
    ev = load(spark, "events", sf_dir)

    def first_ts(etype: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    u = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    clicked = F.col("t_click") > F.col("t_view")
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return u.agg(
        F.count("t_view").alias("viewed"),
        F.count(F.when(clicked, 1)).alias("clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("purchased_full_path"),
    )


@query(
    "weekly_retention",
    oracle="""
    WITH f AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cw
        FROM events GROUP BY user_id),
    a AS (
        SELECT e.user_id, f.cw, date_trunc('week', e.ts) AS aw
        FROM events e JOIN f USING (user_id))
    SELECT cw AS cohort_week,
           CAST(date_diff('day', cw, aw) // 7 AS INTEGER) AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM a GROUP BY 1, 2
    """,
    tags=("events", "retention", "extension"),
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: cohort = ISO week (Monday-truncated)
    of a user's first event; a cell counts the distinct cohort users
    active ``week_offset`` weeks later.

    Both Spark and DuckDB truncate weeks to Monday, so the day-diff
    between two week-starts is an exact multiple of 7 and the integer
    division is lossless.
    """
    ev = load(spark, "events", sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cw",
            F.date_trunc("week", F.col("ts")).alias("aw"),
        )
    )
    return (
        act.groupBy(
            F.col("cw").alias("cohort_week"),
            (F.datediff("aw", "cw") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events)
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    tags=("events", "window", "extension"),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (Markov first-order
    counts): how often does event type A immediately precede B in a
    user's timeline. ``event_id`` breaks same-timestamp ties so the
    sequence — and therefore the matrix — is deterministic.
    """
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "inverted_index",
    oracle=f"""
    WITH t AS (
        SELECT DISTINCT doc_id, unnest(w) AS term
        FROM (SELECT doc_id, {_SQL_WORDS_LOWER} AS w FROM documents)),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM t GROUP BY term HAVING count(*) BETWEEN 10 AND 400)
    SELECT t.term, df.df,
           array_to_string(list_sort(list(t.doc_id)), ',') AS postings
    FROM t JOIN df ON t.term = df.term
    GROUP BY t.term, df.df
    """,
    tags=("text", "index", "extension"),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index (term → sorted posting list) for mid-frequency
    terms (document frequency in [10, 400]).

    COUNT-FIRST two-pass shape: pass 1 computes per-term df from
    distinct ``(doc_id, term)`` pairs (cheap count, full map-side
    partial agg); only terms inside the df band — a provably small
    set, so it is broadcast — reach pass 2, which collects the actual
    posting lists. A single-pass ``collect_set`` + HAVING would make
    some executor materialize the complete posting list of every
    stopword-class term before discarding it; this plan never does.
    """
    docs = spread(load(spark, "documents", sf_dir), "doc_id")
    t = (
        docs.select(
            "doc_id",
            F.explode_outer(Q.words(F.lower(F.col("text")))).alias("term"),
        )
        .filter(F.col("term").isNotNull())
        .distinct()
    )
    df = (
        t.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(10, 400))
    )
    return (
        t.join(F.broadcast(df), "term")
        .groupBy("term", "df")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
