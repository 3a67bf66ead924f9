"""Data-layout operators: Z-order (Morton) clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the data:
parquet keeps per-file/row-group min-max stats, and Spark prunes
row-groups whose stats exclude the predicate. A table sorted on ONE
key prunes only on that key; interleaving the bits of TWO (or more)
keys (Morton / Z-order curve) keeps every participating column
locally clustered, so range predicates on ANY of them skip most of
the file set — the same layout trick Delta's OPTIMIZE ZORDER BY and
ClickHouse's mortonEncode use.

Everything here is closed-form bit arithmetic (the classic
shift-or-mask bit spread) — pure JVM expressions, exactly mirrored in
the DuckDB oracle, no UDFs, no lambdas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: shift-mask pairs spreading a 16-bit value onto even bit positions
_SPREAD16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` onto the even bit positions of
    a 32-bit value (b15..b0 -> positions 30,28,...,0)."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD16:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key2(x: Column | str, y: Column | str) -> Column:
    """Morton interleave of two 16-bit keys: x takes even bits, y odd.
    Monotone in neither input alone — that's the point: sorting by it
    clusters BOTH dimensions simultaneously."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    return spread_bits16(xc).bitwiseOR(F.shiftleft(spread_bits16(yc), 1))


def spread16_sql(expr: str) -> str:
    """DuckDB rendering of :func:`spread_bits16` (identical arithmetic)."""
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD16:
        x = f"((({x} | ({x} << {shift})) & {mask}))"
    return x


def zorder_key2_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB rendering of :func:`zorder_key2`."""
    return f"({spread16_sql(x_expr)} | ({spread16_sql(y_expr)} << 1))"


def scaled_zorder_key2(df: DataFrame, x: str, y: str) -> Column:
    """Z-key over min-max-normalized inputs.

    Raw interleave wastes curve resolution when the two columns have
    unequal ranges (a 4-bit-cardinality column contributes only 4 of
    its 16 bit positions, so the curve degenerates toward a 1-D sort
    on the wider column). Normalizing each column onto [0, 65535]
    first — what production Z-order writers do via range-ids — gives
    both dimensions equal say. Costs one min/max aggregate (a scalar,
    any scale)."""
    stats = df.agg(
        F.min(x).alias("xlo"), F.max(x).alias("xhi"),
        F.min(y).alias("ylo"), F.max(y).alias("yhi"),
    ).first()

    def scale(c: str, lo, hi) -> Column:
        span = max(int(hi) - int(lo), 1)
        return (
            (F.col(c).cast("long") - F.lit(int(lo))) * 65535 / F.lit(span)
        ).cast("long")

    return zorder_key2(
        scale(x, stats["xlo"], stats["xhi"]), scale(y, stats["ylo"], stats["yhi"])
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of (x, y):
    range-partition by the Morton key (equal-size output files via
    range exchange sampling), sort within each partition, write.

    After this, a predicate on EITHER column prunes most files via
    parquet min-max stats — the layout is the operator; readers need
    no special code. At 100 TB, run per table-partition (e.g. per
    day) so the range exchange never needs a global sample.
    """
    keyed = df.withColumn("__z", scaled_zorder_key2(df, x, y))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
