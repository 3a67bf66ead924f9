"""Shared pytest fixtures: one SparkSession for the whole run.

Local-mode session with the same configs we would ship on a cluster
(AQE, UTC, Arrow) but a small core count so the suite stays fast.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from museum_image_etl_gridfs_spark.session import get_spark

    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
