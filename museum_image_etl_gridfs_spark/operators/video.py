"""Video binary columns: frame-sample / per-frame features.

Third leg of the multimodal pattern (images, audio, video): opaque
``binary`` column, typed header metadata, Arrow-batched mapInPandas,
pluggable codec. The tested codec is a dependency-free raw container
(``VID0`` header: width, height, fps, n_frames + concatenated RGB
rasters) so frame indexing and sampling arithmetic are real; an
ffmpeg/pyav codec slots in behind the same methods.

Frame sampling is THE bandwidth lever for video training data: a
1-in-N sample cuts downstream bytes by N before anything heavier
runs — so it happens in the same pass as decode, before any shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

_MAGIC = b"VID0"
_HEADER = struct.Struct("<4siiii")  # magic, width, height, fps, n_frames


class RawVideoCodec:
    """Deterministic raw video: VID0 header + n_frames RGB rasters."""

    @staticmethod
    def encode(frames, fps: int) -> bytes:
        import numpy as np

        arr = np.asarray(frames, dtype=np.uint8)
        n, h, w, c = arr.shape
        assert c == 3, "RGB frames only"
        return _HEADER.pack(_MAGIC, w, h, fps, n) + arr.tobytes()

    @staticmethod
    def decode(blob: bytes):
        import numpy as np

        magic, w, h, fps, n = _HEADER.unpack_from(blob)
        if magic != _MAGIC:
            raise ValueError("not a VID0 blob")
        frames = np.frombuffer(
            blob, dtype=np.uint8, offset=_HEADER.size
        ).reshape(n, h, w, 3)
        return frames, fps


def synthesize_video(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 16,
    height: int = 12,
    fps: int = 10,
    n_frames: int = 20,
) -> DataFrame:
    """Deterministic fake clips: pixel (f, y, x, c) of key k =
    (k*131 + f*17 + y*7 + x*3 + c) mod 256."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        f_, y, x, c = np.ogrid[0:n_frames, 0:height, 0:width, 0:3]
        base = (f_ * 17 + y * 7 + x * 3 + c).astype(np.int64)
        for pdf in batches:
            blobs = [
                RawVideoCodec.encode(((int(k) * 131 + base) % 256).astype("uint8"), fps)
                for k in pdf[key_col]
            ]
            pdf = pdf.copy()
            pdf["video"] = pd.Series(blobs, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(gen, f"{out_fields}, video binary")


def sample_frames(
    df: DataFrame, video_col: str = "video", *, every: int = 5
) -> DataFrame:
    """Keep every ``every``-th frame (starting at frame 0), re-encode
    with fps scaled down accordingly; quarantine rows on bad blobs.
    Output bytes shrink ~1/every — done pre-shuffle by design."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def tx(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out, status, kept = [], [], []
            for blob in pdf[video_col]:
                try:
                    frames, fps = RawVideoCodec.decode(bytes(blob))
                    sampled = frames[::every]
                    out.append(
                        RawVideoCodec.encode(sampled, max(fps // every, 1))
                    )
                    status.append("ok")
                    kept.append(len(sampled))
                except Exception as e:  # noqa: BLE001 - quarantine row
                    out.append(None)
                    status.append(f"error:{type(e).__name__}")
                    kept.append(0)
            pdf = pdf.copy()
            pdf["video_sampled"] = pd.Series(out, index=pdf.index, dtype=object)
            pdf["n_frames_kept"] = kept
            pdf["sample_status"] = pd.Series(status, index=pdf.index)
            yield pdf

    return df.mapInPandas(
        tx,
        f"{out_fields}, video_sampled binary, n_frames_kept int, "
        "sample_status string",
    )


def video_features(df: DataFrame, video_col: str = "video") -> DataFrame:
    """Header metadata + per-clip features: dims, fps, frame count,
    duration, mean luminance, inter-frame motion proxy (mean abs
    frame delta)."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def fx(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in
                    ("width", "height", "fps", "n_frames", "duration_s",
                     "mean_luma", "motion")}
            for blob in pdf[video_col]:
                frames, fps = RawVideoCodec.decode(bytes(blob))
                n, h, w, _ = frames.shape
                x = frames.astype(np.float64)
                luma = x @ np.array([0.299, 0.587, 0.114])
                motion = (
                    float(np.abs(np.diff(x, axis=0)).mean()) if n > 1 else 0.0
                )
                cols["width"].append(w)
                cols["height"].append(h)
                cols["fps"].append(fps)
                cols["n_frames"].append(n)
                cols["duration_s"].append(n / fps)
                cols["mean_luma"].append(float(luma.mean()))
                cols["motion"].append(motion)
            pdf = pdf.copy()
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(
        fx,
        f"{out_fields}, width int, height int, fps int, n_frames int, "
        "duration_s double, mean_luma double, motion double",
    )
