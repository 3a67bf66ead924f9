"""Registry-wide plan audit: no query may grow a Python eval node
unless it is explicitly whitelisted (tools/plan_audit.py) — the guard
against a convenient UDF sneaking into a hot relational path."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import EXPECTED_PYTHON, audit  # noqa: E402


def test_no_unexpected_python_nodes_anywhere(spark, sf_dir):
    results = audit(spark, sf_dir)
    assert len(results) >= 100  # the whole registry got audited
    offenders = {
        name: row["python"]
        for name, row in results.items()
        if "error" not in row and row["python"] and name not in EXPECTED_PYTHON
    }
    assert offenders == {}, f"unexpected Python eval nodes: {offenders}"
    # and the whitelist doesn't rot: whitelisted queries DO use Python
    stale = {
        name
        for name in EXPECTED_PYTHON
        if name in results
        and "error" not in results[name]
        and not results[name]["python"]
    }
    assert stale == set(), f"whitelisted but Python-free now: {stale}"


def test_relational_flagships_are_shuffle_lean(spark, sf_dir):
    results = audit(
        spark, sf_dir, ["pricing_summary", "revenue_by_nation", "table_profile"]
    )
    # pricing_summary: one shuffle (the groupBy) — the TPC-H Q1 contract
    assert results["pricing_summary"]["exchanges"] <= 1
    assert results["pricing_summary"]["python"] == []
    # dimension joins broadcast instead of shuffling the fact
    assert results["revenue_by_nation"]["broadcasts"] >= 2
    # the one-scan profile: a single aggregate, no python
    assert results["table_profile"]["scans"] == 1
    assert results["table_profile"]["python"] == []
