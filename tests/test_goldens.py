"""Golden-output diffs (S10): 10-row samples of key stages must match
the committed artifacts byte-for-byte — the engine's version of the
reference's data_outputs/metadata_sample.json verification style."""

from __future__ import annotations

import json
import os

import pytest

from tools.make_goldens import (
    FULL_GOLDENS,
    FULL_SF_DIR,
    GOLDENS,
    OUT_DIR,
    SF_DIR,
    full,
    sample,
)
from museum_image_etl_gridfs_spark.plans import all_queries


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden_sample_matches(spark, name):
    path = os.path.join(OUT_DIR, f"{name}_sample.json")
    assert os.path.exists(path), "run tools/make_goldens.py"
    with open(path) as f:
        want = json.load(f)
    got = sample(all_queries()[name].build(spark, SF_DIR), GOLDENS[name])
    assert got == want


@pytest.mark.parametrize("name", sorted(FULL_GOLDENS))
def test_golden_full_matches(spark, name):
    """Full sf0.01 result vs the committed artifact — the correctness
    gate for the seeded/iterative queries the DuckDB oracle can't
    express (the driver only row-counts these)."""
    path = os.path.join(OUT_DIR, f"{name}_full.json")
    assert os.path.exists(path), "run tools/make_goldens.py"
    with open(path) as f:
        want = json.load(f)
    got = full(all_queries()[name].build(spark, FULL_SF_DIR), FULL_GOLDENS[name])
    assert got == want
