"""Pipeline observability (SURVEY.md A4 / §2.11).

The reference prints progress counts by materializing lists
(``len(processed_records)``). Spark-native: ``df.observe`` attaches
aggregate metrics to a plan that are collected AS the job runs — no
second pass over the data, which at 100 TB is the difference between
free telemetry and doubling the pipeline cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_stage_metrics(
    df: DataFrame, stage: str
) -> tuple[DataFrame, Observation]:
    """Attach row-count + null-id-count metrics to a stage.

    Returns (df, observation); read ``observation.get`` after the
    first action on the returned DataFrame.
    """
    obs = Observation(stage)
    first_col = df.columns[0]
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col(first_col).isNull(), 1).otherwise(0)
            ).alias("n_null_keys"),
        ),
        obs,
    )


def quarantine_split(
    df: DataFrame, status_col: str, ok_value: str = "ok"
) -> tuple[DataFrame, DataFrame]:
    """§2.11 skip-bad-record convention: split a PERMISSIVE-style
    status-column DataFrame into (good, quarantine) — the distributed
    replacement for the reference's try/except-continue, which drops
    failures silently."""
    good = df.filter(F.col(status_col) == ok_value)
    bad = df.filter(F.col(status_col) != ok_value)
    return good, bad
