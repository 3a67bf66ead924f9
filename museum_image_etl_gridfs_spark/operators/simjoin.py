"""Prefix-filtered exact set-similarity join (AllPairs / PPJoin
family, Bayardo et al., WWW'07; Xiao et al., WWW'08 — public
algorithms re-expressed as DataFrame ops).

The third strategy in the near-dup toolbox, between the quadratic
blocked matmul (operators/ann.py — exact, bounded by block size) and
MinHash-LSH (operators/dedup.py — subquadratic but approximate):
EXACT Jaccard-threshold pairs at subquadratic cost.

Key fact: order every token set by GLOBAL token frequency
(rarest first). For Jaccard(x, y) ≥ t, x and y must share at least
one token among each one's first ``|s| − ⌈t·|s|⌉ + 1`` ordered tokens
(the prefix) — so candidates are only pairs sharing a PREFIX token,
and prefixes are short and start with rare tokens, which keeps the
token-keyed candidate join sparse. Every candidate is then verified
exactly, so the output is identical to the brute-force join.

Scale shape: one vocabulary aggregate (map-side combined), a
distributed total-order rank over it (range-bucket prefix-sum — never
a single-task global sort; the vocabulary of a 100 TB corpus is
itself a large table), a planner-chosen rank join (broadcast only
when the vocab is actually small), one explode of short prefixes,
one token-keyed self-join
whose fan-out per token is bounded by that token's document
frequency (the frequency ordering puts hot tokens OUT of prefixes),
and one exact verification join on the pair key. No stage is
quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quantiles import global_row_number


def prefix_filter_jaccard_join(
    docs: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    threshold: float,
    block_col: str | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for every pair with exact token-set
    Jaccard ≥ ``threshold`` (``id_a < id_b``); pairs are restricted to
    equal ``block_col`` when given (same contract as
    ``operators/ann.jaccard_pairs_blocked``).

    Exact: the prefix filter only PRUNES candidates that provably
    cannot reach the threshold; survivors are verified with exact
    intersection arithmetic.

    NOT a pure lazy plan builder: the vocabulary rank runs through
    :func:`~..quantiles.global_row_number`, whose range-bucket
    machinery executes Spark jobs (a min/max probe, split-point
    sampling, per-bucket counts) at CONSTRUCTION time — same eager
    pattern as ``running_totals``. Plan-inspection/dry-run callers pay
    the vocabulary aggregation even if they never act on the result.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    blk = F.col(block_col) if block_col else F.lit(0)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.col(tokens_col)).alias("ts"),
        blk.alias("blk"),
    )

    # global document frequency per token -> rarest-first total order
    # (df, token) so ordering is deterministic across runs/engines.
    # At 100 TB of text the vocabulary is itself a large table
    # (hundreds of millions of tokens), so the rank must NOT be a
    # bare row_number() OVER (ORDER BY ...) — that's a single-task
    # global sort — and the rank join must NOT force a broadcast of
    # the full vocab. global_row_number assigns the identical total
    # order distributively (range-bucket + broadcast per-bucket
    # offsets), and the planner/AQE picks the join strategy (it will
    # still broadcast when the vocab is actually small).
    vocab = (
        base.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    ranked = global_row_number(vocab, ["df", "tok"], out_col="rnk").select(
        "tok", "rnk"
    )

    # order each set rarest-first and keep the prefix
    with_rnk = (
        base.select("id", "blk", F.size("ts").alias("n"), "ts")
        .withColumn("tok", F.explode("ts"))
        .join(ranked, "tok")
    )
    ordered = (
        with_rnk.groupBy("id", "blk", "n")
        .agg(F.sort_array(F.collect_list(F.struct("rnk", "tok"))).alias("ord"))
        .withColumn(
            "plen",
            # ceil over a DOWN-nudged product: binary t·n can land an
            # ulp ABOVE the exact rational (e.g. 0.14*50 →
            # 7.000000000000001, ceil 8), which would SHORTEN the
            # prefix and silently drop qualifying pairs. Undershooting
            # only lengthens the prefix (more candidates, still
            # exact), so the nudge is always safe.
            F.col("n")
            - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)).cast("int")
            + 1,
        )
        .withColumn("prefix", F.expr("slice(ord.rnk, 1, plen)"))
    )

    # candidate join on shared prefix tokens, plus two provable prunes
    # evaluated inside the equi-join, BEFORE the distinct and the
    # exact-verify stages (both use the same ulp down-nudge as plen:
    # undershooting only ADMITS extra candidates — still exact after
    # verification — never drops one):
    # - AllPairs LENGTH filter: Jaccard(x,y) <= min(|x|,|y|) /
    #   max(|x|,|y|), so a qualifying pair needs t*|a| <= |b| and
    #   t*|b| <= |a|.
    # - PPJoin POSITIONAL filter: a pair with Jaccard >= t needs
    #   overlap o >= ceil(t/(1+t) * (|a|+|b|)); a shared prefix token
    #   at 0-based set positions (i, j) bounds the overlap by
    #   1 + min(|a|-i-1, |b|-j-1) (only later-ranked tokens can still
    #   match). A TRUE pair always passes at its first (lowest-rank)
    #   shared token — the bound is loosest there — so filtering each
    #   occurrence and keeping pairs with ANY survivor is exact, while
    #   deep-prefix-only collisions are dropped (measured -47%
    #   occurrence rows into the distinct on the dense fixture).
    tn = F.lit(threshold)
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.n") + F.col("b.n"))
        - F.lit(1e-9)
    )
    ubound = 1 + F.least(
        F.col("a.n") - F.col("a.pos") - 1, F.col("b.n") - F.col("b.pos") - 1
    )
    sides = ordered.select(
        "id", "blk", "n", F.posexplode("prefix").alias("pos", "p")
    )
    cand = (
        sides.alias("a")
        .join(
            sides.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p") == F.col("b.p"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n") >= tn * F.col("a.n") - F.lit(1e-9))
            & (F.col("a.n") >= tn * F.col("b.n") - F.lit(1e-9))
            & (ubound >= alpha),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sets = ordered.select("id", F.col("ord.tok").alias("toks"), "n")
    verified = (
        cand.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("toks").alias("ts_a"),
                F.col("n").alias("na"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("toks").alias("ts_b"),
                F.col("n").alias("nb"),
            ),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("ts_a", "ts_b")))
        .withColumn(
            "jaccard",
            F.when(F.col("na") + F.col("nb") - F.col("inter") == 0, F.lit(0.0))
            .otherwise(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")
