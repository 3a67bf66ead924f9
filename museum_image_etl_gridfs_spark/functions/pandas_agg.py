"""Pandas grouped-aggregate UDFs (the "custom UDAF" surface, §2.10).

The engine's rule is native-first: every aggregate the registry
queries need exists as a built-in (the survey's U3 struct-collect is
native ``collect_list``). These Arrow-batched grouped aggregates
exist for the cases built-ins genuinely can't express — a whole-group
numpy/pandas computation — and as the pinned pattern for adding more:
``@pandas_udf`` scalar-return, never a row-at-a-time Python UDF.

Each ships with a native-equivalent test in ``tests/test_chunking.py``
so the Arrow path is provably value-identical where both exist.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# NB: the return type must be a DataType instance, not a DDL string —
# string types are parsed through the active SparkSession, which does
# not exist yet at import time.


@pandas_udf(DoubleType())
def pd_median(v: pd.Series) -> float:
    """Exact in-group median (linear interpolation at even counts —
    same convention as Spark's exact ``percentile(x, 0.5)``, which is
    what the parity test compares against).

    Grouped-agg pandas UDFs materialize EACH GROUP in executor
    memory as one pandas Series — fine for per-source/per-label
    cardinalities, wrong for power-law groups at 100 TB (use the
    native ``percentile_approx`` there instead).
    """
    return float(v.median())


@pandas_udf(DoubleType())
def pd_trimmed_mean_10(v: pd.Series) -> float:
    """10%-trimmed mean — drops the bottom and top decile before
    averaging; robust location estimate with no native Spark
    equivalent (the genuine UDAF use case). NaN for empty groups.
    """
    if len(v) == 0:
        return float("nan")
    lo, hi = v.quantile(0.10), v.quantile(0.90)
    kept = v[(v >= lo) & (v <= hi)]
    return float(kept.mean()) if len(kept) else float("nan")
