"""Sweep-artifact row schema: every check_correctness row must carry
the engine/oracle time split and the co-tenant noise ledger.

Round 6's lesson (NOTES.md): a sweep row reading 839 s on identical
data as a 232 s round-4 row was unadjudicable after the fact because
the row carried only a combined ``sec``. The split + ledger promised
in NOTES ("future full sweeps get the split everywhere") is enforced
here on a mini-sweep so it cannot silently rot out of the tool.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import check_correctness  # noqa: E402

NOISE_KEYS = {"steal_cs", "wall_s", "loadavg1"}


def _run(tmp_path, argv):
    out = tmp_path / "sweep.json"
    old = sys.argv
    sys.argv = ["check_correctness.py", "--out", str(out), *argv]
    try:
        rc = check_correctness.main()
    finally:
        sys.argv = old
    with open(out) as f:
        return rc, json.load(f)


def test_full_compare_rows_carry_split_and_noise(tmp_path, spark, sf_dir):
    rc, data = _run(
        tmp_path, ["--sf-dir", sf_dir, "distinct_segments", "top_orders"]
    )
    assert rc == 0 and data["failed"] == []
    for name in ("distinct_segments", "top_orders"):
        row = data["results"][name]
        assert row["status"] == "OK"
        assert {"sec", "spark_sec", "oracle_sec", "noise"} <= set(row)
        assert NOISE_KEYS <= set(row["noise"])
        # the split partitions the total: engine + oracle <= total
        assert row["spark_sec"] <= row["sec"] + 0.01
        assert row["oracle_sec"] <= row["sec"] + 0.01


def test_count_only_rows_carry_split_and_noise(tmp_path, spark, sf_dir):
    rc, data = _run(
        tmp_path,
        ["--sf-dir", sf_dir, "--count-only", "top_orders", "top_orders"],
    )
    assert rc == 0 and data["failed"] == []
    row = data["results"]["top_orders"]
    assert row["status"] == "COUNT_OK"
    assert {"rows", "sec", "spark_sec", "oracle_sec", "noise"} <= set(row)
    assert NOISE_KEYS <= set(row["noise"])


def test_spark_only_rows_carry_engine_time_and_noise(tmp_path, spark, sf_dir):
    rc, data = _run(
        tmp_path,
        ["--sf-dir", sf_dir, "--spark-only", "top_orders", "top_orders"],
    )
    assert rc == 0 and data["failed"] == []
    row = data["results"]["top_orders"]
    assert row["status"] == "SPARK_ONLY_OK"
    assert {"rows", "sec", "spark_sec", "noise"} <= set(row)
    assert NOISE_KEYS <= set(row["noise"])


def test_scaling_gate_reads_count_only_engine_time():
    """bench_trend's gate must see COUNT_OK / SPARK_ONLY_OK rows via
    spark_sec and must NOT fall back to the mixed engine+oracle total
    (the round-6 blind spot: the three heaviest pair-join queries sat
    outside the gate entirely)."""
    import importlib

    bench_trend = importlib.import_module("bench_trend")
    src = open(bench_trend.__file__).read()
    # structural pin: green statuses include the count/spark-only rows
    assert '"COUNT_OK"' in src and '"SPARK_ONLY_OK"' in src
    # and the gate path has no mixed-semantics fallback to row["sec"]
    assert 'row.get("spark_sec", row.get("sec"))' not in src


def test_contended_row_annotation():
    """bench_trend.contended_rows marks exactly the rows whose ledger
    shows a hostile window (VERDICT r7 item 6): loadavg above 1.5x
    cores at either end, or steal above 2%/cpu — and ignores fast rows
    where the solo protocol isn't worth its cost."""
    import importlib

    bt = importlib.import_module("bench_trend")
    n_cpus = 32
    data = {
        "results": {
            # r7's image_etl_gridfs shape: steal 2.9%/cpu -> flagged
            "steal_heavy": {
                "status": "OK", "spark_sec": 545.1,
                "noise": {"steal_cs": 50487, "wall_s": 547.5, "loadavg1": 39.2},
            },
            # loadavg over 1.5x cores at the START end -> flagged
            "load_heavy": {
                "status": "OK", "spark_sec": 60.0,
                "noise": {"steal_cs": 0, "wall_s": 60.0,
                          "loadavg1_start": 50.0, "loadavg1": 2.0},
            },
            # clean ledger -> not flagged
            "clean": {
                "status": "OK", "spark_sec": 80.0,
                "noise": {"steal_cs": 100, "wall_s": 80.0, "loadavg1": 8.0},
            },
            # hostile window but sub-5s row -> not worth a solo re-run
            "fast": {
                "status": "OK", "spark_sec": 1.2,
                "noise": {"steal_cs": 500, "wall_s": 1.2, "loadavg1": 60.0},
            },
        }
    }
    flagged = {r.split(" ")[0] for r in bt.contended_rows(data, n_cpus)}
    assert flagged == {"steal_heavy", "load_heavy"}
