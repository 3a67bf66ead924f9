"""Deterministic weighted reservoir sampling (Efraimidis–Spirakis A-ES).

"Keep the N best-weighted examples per stratum, reproducibly" is the
sampling question a training-data pipeline actually asks (N docs per
source weighted by quality/length), and the published answer is the
A-ES reservoir key (Efraimidis & Spirakis, IPL 2006): draw u ~ U(0,1)
per row, rank by u^(1/w), keep the top N — inclusion probability is
proportional to weight, no coordination between rows needed.

The distributed twist here: u is not an RNG draw but a hash of the
row key (md5-derived 32-bit uniform), which makes the sample
order-independent, partitioning-independent, re-runnable to the same
rows, and auditable by any other engine — the same determinism
argument as hash-bucket stratified sampling
(plans/queries_quality.py::stratified_sample), extended to weights.
Ranking uses ln(u)/w (monotone in u^(1/w), avoids the pow); ties are
broken by the row key so the sample is a total function of the data.

Scale shape: per-group top-n via the two-phase partial merge
(operators/topk.grouped_topk) — every partial is capped at n rows per
(group, input-partition), so the reservoir never materializes anywhere
and no single task sorts a whole group (r10; previously a per-group
ranking window).

Reference parity: the reference's only sampling is ``head(20)``
(``/root/reference/src/ingestion.py:30`` caps downloads); this is the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^32 — the u denominator for the 8-hex-digit (32-bit) md5 prefix.
_U_DENOM = float(1 << 32)


def wrs_key(id_col: Column | str, weight: Column | str, *, salt: str = "v1") -> Column:
    """A-ES reservoir key ln(u)/w with u hash-derived from the row id.

    u = (first-8-hex(md5(id || ':wrs:' || salt)) + 0.5) / 2^32 — the
    +0.5 keeps u strictly inside (0,1) so ln(u) is finite. Larger key
    = more likely sampled. Non-positive weights yield NULL: a negative
    w would flip ln(u)/w positive and outrank every valid row, and
    w = 0 yields -Infinity — both are caller bugs.
    :func:`weighted_reservoir_sample` filters ``key.isNotNull()``, so
    such rows are EXCLUDED from the reservoir entirely (not sorted
    last); a raw-``wrs_key`` caller ordering DESC sees them NULLS
    LAST.
    """
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight) if isinstance(weight, str) else weight
    v = F.conv(
        F.substring(F.md5(F.concat(idc.cast("string"), F.lit(f":wrs:{salt}"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (v + F.lit(0.5)) / F.lit(_U_DENOM)
    wd = w.cast("double")
    return F.when(wd > 0, F.log(u) / wd)


def weighted_reservoir_sample(
    df: DataFrame,
    *,
    id_col: str,
    group_col: str,
    weight: Column | str,
    n: int,
    salt: str = "v1",
) -> DataFrame:
    """Top-``n`` rows per ``group_col`` under the A-ES key — a
    weight-proportional sample without ties to run order, partition
    count, or an RNG seed. Adds ``wrs_rank`` (1-based within group);
    the float key itself is dropped so downstream comparisons stay
    exact.

    Rows with non-positive weight are EXCLUDED, not merely sorted
    last: a group with fewer than ``n`` positive-weight rows returns
    only the valid rows rather than padding the reservoir with
    zero/negative-weight ones (which have sampling probability 0 by
    definition in A-ES). Oracles mirroring this operator must filter
    ``weight > 0`` before ranking.

    Scale shape (r10): per-group top-n via the two-phase partial
    merge (:func:`~.topk.grouped_topk`) — a per-group ranking window
    would sort the biggest group (source, shard) in ONE task at
    corpus scale; the two-phase form caps every partial at n rows per
    (group, input-partition). Same rows, same rank (the A-ES key +
    id tiebreak is a strict total order)."""
    from .topk import grouped_topk

    key = wrs_key(id_col, weight, salt=salt)
    keyed = df.filter(key.isNotNull()).withColumn("__wrs_key", key)
    return grouped_topk(
        keyed,
        [group_col],
        [("__wrs_key", False), (id_col, True)],
        n,
        rn_col="wrs_rank",
    ).drop("__wrs_key")
