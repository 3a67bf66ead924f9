"""Grouped applyInPandas (the UDAF-shaped Python escape hatch):
per-group computations Spark aggregates can't express, verified
against local pandas on collected data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load


def test_per_user_zscore_matches_local(spark, sf_dir):
    ev = load(spark, "events", sf_dir).select("user_id", "event_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype="float64")
        std = v.std(ddof=1)
        z = (v - v.mean()) / std if std > 0 else np.zeros_like(v)
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "z": z}
        )

    got = (
        ev.groupBy("user_id")
        .applyInPandas(zscore, "user_id long, event_id long, z double")
        .toPandas()
        .set_index("event_id")["z"]
        .sort_index()
    )

    local = ev.toPandas()
    want = (
        local.assign(
            z=local.groupby("user_id")["value"].transform(
                lambda s: (s - s.mean()) / s.std(ddof=1)
            )
        )
        .set_index("event_id")["z"]
        .sort_index()
    )
    assert np.allclose(got.to_numpy(), want.to_numpy(), atol=1e-9)


def test_zscore_invariants(spark, sf_dir):
    ev = load(spark, "events", sf_dir).select("user_id", "event_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype="float64")
        std = v.std(ddof=1)
        z = (v - v.mean()) / std if std > 0 else np.zeros_like(v)
        return pd.DataFrame({"user_id": pdf["user_id"], "z": z})

    out = ev.groupBy("user_id").applyInPandas(zscore, "user_id long, z double")
    stats = out.groupBy("user_id").agg(
        F.avg("z").alias("mean_z"), F.stddev("z").alias("std_z")
    )
    for r in stats.collect():
        assert abs(r["mean_z"]) < 1e-9
        assert abs(r["std_z"] - 1.0) < 1e-9
