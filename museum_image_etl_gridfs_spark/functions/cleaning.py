"""Null/empty standardization — the reference's cleaning stage.

Reference: ``src/transform_load.py:22-43`` sets
``artist, culture, period, object_date, medium`` to ``"NA"`` when the
value is falsy — which in Python catches **NULL, empty string, and
missing key** alike (comment at ``src/etl_museum_gridfs.py:131``).

Plain ``df.na.fill("NA")`` is NOT equivalent (misses ``""``); the
expression below reproduces the exact three-way semantics as a single
JVM-side CASE WHEN, so it stays inside whole-stage codegen and
pushes through Catalyst untouched.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NA_SENTINEL = "NA"


def na_standardize_col(col: Column | str, sentinel: str = NA_SENTINEL) -> Column:
    """falsy (NULL | ``""``) -> sentinel, else identity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == ""), F.lit(sentinel)).otherwise(c)


def na_standardize(
    df: DataFrame, columns: Iterable[str], sentinel: str = NA_SENTINEL
) -> DataFrame:
    """Apply three-way NA standardization to ``columns``, preserving
    all other columns and column order."""
    targets = set(columns)
    missing = targets - set(df.columns)
    if missing:
        raise ValueError(f"columns not in DataFrame: {sorted(missing)}")
    return df.select(
        *[
            na_standardize_col(c, sentinel).alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )
