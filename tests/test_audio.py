"""Audio multimodal plumbing: codec round-trip, resample, features."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.operators.audio import (
    PcmCodec,
    audio_features,
    resample_audio,
    synthesize_audio,
)


def test_pcm_roundtrip():
    samples = np.array([-2048, 0, 2047, 5], dtype=np.int16)
    blob = PcmCodec.encode(samples, 8000)
    got, rate = PcmCodec.decode(blob)
    assert rate == 8000 and np.array_equal(got, samples)


def test_resample_halves_length():
    samples = np.arange(100, dtype=np.int16)
    half = PcmCodec.resample(samples, 8000, 4000)
    assert len(half) == 50
    assert half[0] == samples[0]  # nearest-sample keeps first


def test_spark_pipeline(spark):
    df = synthesize_audio(
        spark.range(3).select(F.col("id").alias("k")), "k",
        sample_rate=8000, n_samples=800,
    )
    out = resample_audio(df, dst_rate=2000)
    feats = audio_features(
        out.select("k", F.col("audio_resampled").alias("audio"), "resample_status")
    )
    rows = {r["k"]: r for r in feats.collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r["resample_status"] == "ok"
        assert r["sample_rate"] == 2000
        assert abs(r["duration_s"] - 0.1) < 1e-9  # 800/8000 s preserved
        assert r["rms"] > 0
        assert r["zero_crossings"] > 0


def test_quarantine_bad_audio(spark):
    good = PcmCodec.encode(np.zeros(10, dtype=np.int16), 8000)
    df = spark.createDataFrame([(1, good), (2, b"junk")], "k long, audio binary")
    rows = {r["k"]: r for r in resample_audio(df).collect()}
    assert rows[1]["resample_status"] == "ok"
    assert rows[2]["resample_status"].startswith("error:")
    assert rows[2]["audio_resampled"] is None
