"""Video multimodal plumbing: codec, frame sampling, features."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from museum_image_etl_gridfs_spark.operators.video import (
    RawVideoCodec,
    sample_frames,
    synthesize_video,
    video_features,
)


def test_codec_roundtrip():
    frames = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    blob = RawVideoCodec.encode(frames, 10)
    got, fps = RawVideoCodec.decode(blob)
    assert fps == 10 and np.array_equal(got, frames)


def test_frame_sampling(spark):
    df = synthesize_video(
        spark.range(2).select(F.col("id").alias("k")), "k",
        fps=10, n_frames=20,
    )
    out = sample_frames(df, every=5).collect()
    for r in out:
        assert r["sample_status"] == "ok"
        assert r["n_frames_kept"] == 4  # frames 0,5,10,15
        frames, fps = RawVideoCodec.decode(bytes(r["video_sampled"]))
        assert frames.shape[0] == 4 and fps == 2
        # sampled blob ~1/5 the bytes: the pre-shuffle bandwidth win
        assert len(bytes(r["video_sampled"])) < len(bytes(r["video"])) / 4
    # sampled frames are the original frames, not re-synthesized
    orig = {r["k"]: RawVideoCodec.decode(bytes(r["video"]))[0] for r in out}
    for r in out:
        sampled, _ = RawVideoCodec.decode(bytes(r["video_sampled"]))
        assert np.array_equal(sampled, orig[r["k"]][::5])


def test_video_features(spark):
    df = synthesize_video(
        spark.range(2).select(F.col("id").alias("k")), "k",
        width=16, height=12, fps=10, n_frames=20,
    )
    rows = {r["k"]: r for r in video_features(df).collect()}
    for k, r in rows.items():
        assert (r["width"], r["height"], r["fps"], r["n_frames"]) == (16, 12, 10, 20)
        assert abs(r["duration_s"] - 2.0) < 1e-9
        frames, _ = RawVideoCodec.decode(
            bytes(synthesize_video(
                spark.createDataFrame([(k,)], "k long"), "k",
                width=16, height=12, fps=10, n_frames=20,
            ).collect()[0]["video"])
        )
        luma = frames.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        assert abs(r["mean_luma"] - luma.mean()) < 1e-9
        assert r["motion"] > 0


def test_quarantine_bad_video(spark):
    good = RawVideoCodec.encode(
        np.zeros((2, 2, 2, 3), dtype=np.uint8), 10
    )
    df = spark.createDataFrame([(1, good), (2, b"junk")], "k long, video binary")
    rows = {r["k"]: r for r in sample_frames(df, every=2).collect()}
    assert rows[1]["sample_status"] == "ok"
    assert rows[2]["sample_status"].startswith("error:")
    assert rows[2]["video_sampled"] is None
