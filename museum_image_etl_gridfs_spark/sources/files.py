"""File-format edges and table-maintenance utilities.

The reference moves data exclusively through MongoDB; a Spark lake
additionally needs (a) interchange formats — JSONL is the lingua
franca of training-data pipelines, CSV of everything else — and
(b) layout maintenance, because a 100 TB table accumulated from
thousands of micro-batches degenerates into millions of small files
whose per-file open/footer cost dominates scans.

Design rules baked in:
- **Schemas are always explicit on read.** Inference re-scans the
  data (2x reads) and silently drifts types between runs; at scale
  both are unacceptable.
- **Writes are schema-preserving round trips** modulo the format's
  type system (JSON has no date/decimal — they come back as strings
  unless the read schema restores them; tests pin this).
- **Compaction is one narrow+shuffle-free job**: coalesce() to the
  target file count, no repartition shuffle, because compaction must
  not cost a full-data shuffle at 100 TB. Use repartition only when
  changing the clustering (that's write_zordered's job, not ours).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(df: DataFrame, path: str, *, compression: str | None = "gzip") -> None:
    """Write newline-delimited JSON (one object per line, the
    interchange format of every public corpus release). Compressed
    shards stay independently splittable at the file level."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read JSONL with a REQUIRED explicit schema (no inference pass);
    corrupt lines land in ``_corrupt_record`` when the schema includes
    it, else the row is dropped in PERMISSIVE null-filling."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    multi_line: bool = False,
) -> DataFrame:
    """``multi_line=True`` parses quoted embedded newlines correctly
    but makes each file non-splittable (one task per file) — only
    enable it when the data actually contains them."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("multiLine", multi_line)
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (native vectorized reader/writer, zlib default) — the
    interchange format for Hive-ecosystem consumers; preserves the
    full type system (dates, decimals, nested), unlike JSON/CSV."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Read ORC; schema optional because ORC files embed one (reading
    a directory still benefits from an explicit schema to pin
    evolution drift across files)."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.orc(path)


def parquet_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet directory — the
    quantity compaction monitors."""
    files = [
        (e.path, e.stat().st_size)
        for e in os.scandir(path)
        if e.name.endswith(".parquet")
    ]
    return len(files), sum(sz for _, sz in files)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a small-files parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files via coalesce —
    narrow tasks, no shuffle, no change to row order within files.
    Returns the output file count.

    At 100 TB this runs per table-partition (a partition's files
    coalesce among themselves); compacting across partition
    boundaries would destroy partition pruning.
    """
    _, total = parquet_file_stats(spark, src)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    return n_out
