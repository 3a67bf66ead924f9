"""File-format edge tests: JSONL/CSV schema-preserving round trips and
small-file compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.catalog import load
from museum_image_etl_gridfs_spark.sources.files import (
    compact_parquet,
    parquet_file_stats,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_jsonl_round_trip_preserves_rows(spark, sf_dir, tmp_path):
    docs = load(spark, "documents", sf_dir)
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOC_SCHEMA)
    assert back.schema == docs.select(*back.columns).schema
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert a == b


def test_jsonl_corrupt_record_capture(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text('{"doc_id": 1, "text": "ok"}\n{not json}\n')
    df = read_jsonl(
        spark, str(p), "doc_id long, text string, _corrupt_record string"
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["doc_id"] == 1
    assert len(bad) == 1 and bad[0]["doc_id"] is None


def test_csv_round_trip_with_quoting(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'has,comma'), (2, 'has "quote"'), (3, None), (4, "line\nbreak")],
        ["id", "s"],
    )
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(spark, path, "id long, s string", multi_line=True)
    assert sorted(back.collect(), key=lambda r: r["id"]) == sorted(
        df.collect(), key=lambda r: r["id"]
    )


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    li = load(spark, "lineitem", sf_dir)
    frag = str(tmp_path / "fragmented")
    # simulate micro-batch debris: 16 small files
    li.repartition(16).write.mode("overwrite").parquet(frag)
    n_before, total = parquet_file_stats(spark, frag)
    assert n_before == 16
    out = str(tmp_path / "compact")
    n_target = compact_parquet(spark, frag, out, target_file_bytes=total)
    n_after, _ = parquet_file_stats(spark, out)
    assert n_after == n_target == 1
    assert spark.read.parquet(out).count() == li.count()


def test_compaction_is_shuffle_free(spark, sf_dir, tmp_path):
    li = load(spark, "lineitem", sf_dir)
    frag = str(tmp_path / "frag2")
    li.repartition(8).write.mode("overwrite").parquet(frag)
    df = spark.read.parquet(frag).coalesce(2)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan


def test_orc_round_trip_preserves_schema_and_rows(spark, sf_dir, tmp_path):
    from museum_image_etl_gridfs_spark.sources.files import read_orc, write_orc

    li = load(spark, "lineitem", sf_dir).limit(500)
    path = str(tmp_path / "orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert back.schema == li.schema  # ORC embeds the full type system
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    from museum_image_etl_gridfs_spark.sources.files import read_orc, write_orc

    li = load(spark, "lineitem", sf_dir)
    path = str(tmp_path / "orc_pd")
    write_orc(li, path)
    df = read_orc(spark, path).filter(F.col("l_quantity") > 25).select("l_orderkey")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
