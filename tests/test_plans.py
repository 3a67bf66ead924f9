"""Physical-plan assertions — the scale contract, not just results.

A query can be value-correct and still wrong at 100 TB: a scan that
reads every column, a dimension join that shuffles the fact table, a
top-k that global-sorts. These tests pin the plan shapes that make
the engine scale; they fail loudly if a refactor regresses pushdown,
pruning, broadcast choice, or early-termination.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.plans import all_queries

QUERIES = all_queries()


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_to_parquet(spark, sf_dir):
    """pricing_summary's shipdate predicate must reach the scan."""
    plan = _plan(QUERIES["pricing_summary"].build(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or (
        "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    )


def test_column_pruning(spark, sf_dir):
    """A 2-column projection must not read all 16 lineitem columns."""
    df = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_dimension_joins_broadcast(spark, sf_dir):
    """revenue_by_nation: all dimension joins must be broadcast; the
    only sort-merge/shuffle join allowed is fact-to-fact."""
    plan = _plan(QUERIES["revenue_by_nation"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # customer/nation/region must not arrive via a shuffle join
    for dim_key in ("n_nationkey", "r_regionkey"):
        for line in plan.splitlines():
            if "SortMergeJoin" in line:
                assert dim_key not in line


def test_topk_avoids_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    heaps), not a full Sort + CollectLimit."""
    plan = _plan(QUERIES["top_orders"].build(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_no_python_udf_in_relational_queries(spark, sf_dir):
    """Core relational + text queries must stay JVM-side (UDFs are
    reserved for sketches/codecs/HTTP where Spark has no primitive)."""
    for name in (
        "pricing_summary", "revenue_by_nation", "museum_pipeline",
        "text_stats", "text_quality", "lang_id", "running_customer_spend",
        "user_sessions", "gridfs_roundtrip",
    ):
        plan = _plan(QUERIES[name].build(spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


def test_whole_stage_codegen_active(spark, sf_dir):
    """The hot relational path must run inside whole-stage codegen.
    (The formatted mode hides codegen under AdaptiveSparkPlan, so ask
    for codegen mode explicitly.)"""
    df = QUERIES["pricing_summary"].build(spark, sf_dir)
    df.collect()  # AQE finalizes THIS plan only when it executes
    # (count() would wrap it in a new Dataset and finalize that one)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # codegen stages render as "*(n) Operator" in the final plan
    assert "*(" in plan, plan


def test_single_shuffle_for_flagship_pipeline(spark, sf_dir):
    """museum_pipeline (clean -> window dedup -> split) must contain
    exactly ONE exchange: the dedup window's hash partitioning. The
    cleaning and split stages are projections and must not shuffle."""
    import re

    plan = _plan(QUERIES["museum_pipeline"].build(spark, sf_dir))
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n_exchanges == 1, plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """Grouped aggregates must do map-side partials (partial hash
    aggregate below the exchange) so the shuffle carries group rows,
    not raw rows."""
    plan = _plan(QUERIES["flagship_dup_groups"].build(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    """quantity_tier_revenue's interval probe must broadcast the
    bounds (no shuffle of the fact side for the join itself)."""
    plan = _plan(QUERIES["quantity_tier_revenue"].build(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_exists_plans_as_semi_join_with_residual(spark, sf_dir):
    """Q4-shape EXISTS must plan a LEFT SEMI join (not inner+distinct)
    carrying the non-equi shipdate correlation as a join residual."""
    plan = _plan(QUERIES["priority_exists_counts"].build(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "Distinct" not in plan


def test_not_exists_plans_as_anti_join(spark, sf_dir):
    """Q21-shape NOT EXISTS must plan a LEFT ANTI join; the supplier
    dimension must broadcast."""
    plan = _plan(QUERIES["sole_return_suppliers"].build(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_disjunction_derives_single_side_pushdown(spark, sf_dir):
    """Q19-shape OR-of-ANDs: Catalyst must derive the per-side
    implications and push the quantity bracket into the lineitem scan
    (visible as a pushed-down range filter), leaving the residual OR
    post-join."""
    plan = _plan(QUERIES["disjunctive_bracket_revenue"].build(spark, sf_dir))
    scan_section = plan.split("PushedFilters")
    assert len(scan_section) >= 2
    assert "l_quantity" in plan.split("PushedFilters")[1][:400] or (
        "l_quantity" in plan.split("PushedFilters")[-1][:400]
    )


def test_global_scalar_subquery_not_collected(spark, sf_dir):
    """Q11-shape global-total threshold must stay in the plan as a
    broadcast join (single-row build side), never a driver collect —
    the plan has a BroadcastNestedLoopJoin/BroadcastHashJoin and no
    scalar literal baked in."""
    plan = _plan(QUERIES["important_part_values"].build(spark, sf_dir))
    assert "Broadcast" in plan


def test_curation_queries_stay_jvm_side(spark, sf_dir):
    """The curation suite must plan zero row-at-a-time Python
    evaluation. eval_contamination deliberately uses Arrow-batched
    mapInPandas for its vectorized bigram shingling stage (the r2
    rewrite: broadcast eval set, %97 split pushed below the Python
    stage); the rest must plan zero Python nodes of any kind."""
    for name in (
        "quality_flags", "pii_redaction_stats", "eval_contamination",
        "stratified_sample", "token_budget_packing", "tfidf_top_terms",
    ):
        plan = _plan(QUERIES[name].build(spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        if name != "eval_contamination":
            assert "MapInPandas" not in plan, name


def test_contamination_broadcasts_eval_shingles(spark, sf_dir):
    """eval_contamination must broadcast the (small) eval shingle set;
    the corpus side must not shuffle for the join."""
    plan = _plan(QUERIES["eval_contamination"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            raise AssertionError(f"corpus shuffled for join: {line}")


def test_no_hof_lambda_leaks_into_filters(spark, sf_dir):
    """Regression: InferFiltersFromGenerate + pushdown once inlined the
    whole interpreted shingle HOF chain into scan-side filters
    (re-evaluated per row, ~20x). Pin that no Filter in the optimized
    plan contains a lambda expression."""
    for name in ("quality_flags", "eval_contamination", "tfidf_top_terms"):
        df = QUERIES[name].build(spark, sf_dir)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        for line in logical.splitlines():
            if "Filter" in line:
                assert "lambdafunction" not in line, (name, line[:200])


def test_scd2_single_exchange(spark, sf_dir):
    """Both SCD2 windows share one hash partitioning: exactly one
    Exchange, two in-partition Sort+Window stages."""
    import re

    plan = _plan(QUERIES["scd2_customer_versions"].build(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)) == 1, plan


def test_min_cost_supplier_single_fact_exchange(spark, sf_dir):
    """Q2 shape: the explicit repartition(l_partkey) must satisfy BOTH
    the (partkey, suppkey) aggregate and the partkey window — exactly
    one shuffle Exchange; every dimension arrives via broadcast."""
    import re

    plan = _plan(QUERIES["min_cost_supplier"].build(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)) == 1, plan
    assert "BroadcastHashJoin" in plan


def test_market_share_only_fact_join_shuffles(spark, sf_dir):
    """Q8 shape: part/supplier/nation/region/customer all broadcast;
    any sort-merge join may only be the lineitem⋈orders orderkey pair."""
    plan = _plan(QUERIES["nation_market_share"].build(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            for dim_key in ("p_partkey", "s_suppkey", "n_nationkey", "c_custkey"):
                assert dim_key not in line, line


def test_promo_ratio_pushes_month_filter(spark, sf_dir):
    """Q14 shape: the one-month shipdate range must reach the parquet
    scan as pushed filters (row-group pruning does the heavy lifting
    at scale), and part must broadcast."""
    plan = _plan(QUERIES["promo_revenue_ratio"].build(spark, sf_dir))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThanOrEqual(l_shipdate" in pushed and "LessThan(l_shipdate" in pushed
    assert "BroadcastHashJoin" in plan


def test_doc_chunks_zero_exchange(spark, sf_dir):
    """Chunking is narrow end-to-end: sequence→explode→substring must
    introduce no shuffle (and no Python eval)."""
    import re

    plan = _plan(QUERIES["doc_chunks"].build(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_grouping_sets_single_expand_no_union(spark, sf_dir):
    """GROUPING SETS must plan ONE Expand + one aggregate pair — not a
    self-union of three scans."""
    plan = _plan(QUERIES["grouping_sets_revenue"].build(spark, sf_dir))
    assert plan.count("Expand") >= 1
    assert "Union" not in plan


def test_inverted_index_broadcasts_df_band(spark, sf_dir):
    """The surviving-term set (bounded by the df band) must arrive
    broadcast — the token stream never shuffles to meet it."""
    plan = _plan(QUERIES["inverted_index"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_unigram_lm_vocab_broadcast(spark, sf_dir):
    """Both model sides (vocab counts + 1-row total) must broadcast;
    scoring never shuffles the corpus to look up probabilities."""
    plan = _plan(QUERIES["unigram_lm_scores"].build(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
