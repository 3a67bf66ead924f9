"""Audio binary columns: decode / resample / feature-extract.

Same multimodal pattern as operators/images.py (C6 generalized):
opaque ``binary`` column + typed metadata, Arrow-batched mapInPandas
stages, pluggable codec. Audio libs aren't in this container, so the
tested codec is a dependency-free deterministic PCM16 format
(``PCM0`` header + int16 mono samples) with REAL numpy resampling
and features — the Spark-side plumbing (schemas, batch shapes,
quarantine) is what the engine owns; a soundfile/librosa codec slots
in behind the same three methods.

Scale: stages are shuffle-free maps; partition by BYTES when blobs
are large (same rule as images, SURVEY.md §4).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

_MAGIC = b"PCM0"
_HEADER = struct.Struct("<4si")  # magic, sample_rate


class PcmCodec:
    """Deterministic mono PCM16: PCM0 header + little-endian int16."""

    @staticmethod
    def encode(samples, sample_rate: int) -> bytes:
        import numpy as np

        arr = np.asarray(samples, dtype=np.int16)
        return _HEADER.pack(_MAGIC, sample_rate) + arr.tobytes()

    @staticmethod
    def decode(blob: bytes):
        import numpy as np

        magic, rate = _HEADER.unpack_from(blob)
        if magic != _MAGIC:
            raise ValueError("not a PCM0 blob")
        return np.frombuffer(blob, dtype="<i2", offset=_HEADER.size), rate

    @staticmethod
    def resample(samples, src_rate: int, dst_rate: int):
        """Nearest-sample resample (index remap) — deterministic and
        dependency-free; a production codec would band-limit first."""
        import numpy as np

        n_out = max(int(round(len(samples) * dst_rate / src_rate)), 1)
        idx = (np.arange(n_out) * src_rate // dst_rate).clip(0, len(samples) - 1)
        return samples[idx]


def synthesize_audio(
    df: DataFrame, key_col: str, *, sample_rate: int = 8000, n_samples: int = 1600
) -> DataFrame:
    """Deterministic fake clips keyed by an integer column: sample i
    of key k = ((k*7919 + i*31) mod 4096) - 2048 (int16 range)."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            blobs = [
                PcmCodec.encode(
                    ((int(k) * 7919 + i * 31) % 4096 - 2048).astype(np.int16),
                    sample_rate,
                )
                for k in pdf[key_col]
            ]
            pdf = pdf.copy()
            pdf["audio"] = pd.Series(blobs, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(gen, f"{out_fields}, audio binary")


def resample_audio(
    df: DataFrame, audio_col: str = "audio", *, dst_rate: int = 4000
) -> DataFrame:
    """Decode -> resample -> re-encode with quarantine status rows
    (PERMISSIVE, §2.11)."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def tx(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out, status = [], []
            for blob in pdf[audio_col]:
                try:
                    samples, rate = PcmCodec.decode(bytes(blob))
                    out.append(
                        PcmCodec.encode(
                            PcmCodec.resample(samples, rate, dst_rate), dst_rate
                        )
                    )
                    status.append("ok")
                except Exception as e:  # noqa: BLE001 - quarantine row
                    out.append(None)
                    status.append(f"error:{type(e).__name__}")
            pdf = pdf.copy()
            pdf["audio_resampled"] = pd.Series(out, index=pdf.index, dtype=object)
            pdf["resample_status"] = pd.Series(status, index=pdf.index)
            yield pdf

    return df.mapInPandas(
        tx, f"{out_fields}, audio_resampled binary, resample_status string"
    )


def audio_features(df: DataFrame, audio_col: str = "audio") -> DataFrame:
    """Typed metadata + features: sample rate, duration, RMS level,
    zero-crossing count — the audio analog of image channel means."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def fx(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rates, durs, rms, zc = [], [], [], []
            for blob in pdf[audio_col]:
                samples, rate = PcmCodec.decode(bytes(blob))
                x = samples.astype(np.float64)
                rates.append(rate)
                durs.append(len(samples) / rate)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                zc.append(int(np.sum(np.abs(np.diff(np.sign(x))) > 0)))
            pdf = pdf.copy()
            pdf["sample_rate"] = rates
            pdf["duration_s"] = durs
            pdf["rms"] = rms
            pdf["zero_crossings"] = zc
            yield pdf

    return df.mapInPandas(
        fx,
        f"{out_fields}, sample_rate int, duration_s double, rms double, "
        "zero_crossings long",
    )
