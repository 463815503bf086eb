"""Audio payload codec + feature math (AUD1 container).

Audio travels as an opaque binary column, like images and video
(multimodal.py). AUD1 is the deterministic synthetic container —
magic + u32 sample_rate + u32 n_samples + big-endian int16 PCM —
standing in for real codecs (wav/flac/mp3 via soundfile/ffmpeg absent
in this container); the Spark-side plumbing and the feature math are
real. ``pcm_features`` is the SINGLE definition shared by the runtime
kernel and scripts/freeze_audio.py, so the frozen oracle values are
bit-exact by construction.
"""

from __future__ import annotations

import numpy as np

AUDIO_MAGIC = b"AUD1"


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    s = samples.astype(">i2")
    return (
        AUDIO_MAGIC
        + int(sample_rate).to_bytes(4, "big")
        + len(s).to_bytes(4, "big")
        + s.tobytes()
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != AUDIO_MAGIC:
        raise ValueError("not an AUD1 payload")
    rate = int.from_bytes(data[4:8], "big")
    n = int.from_bytes(data[8:12], "big")
    samples = np.frombuffer(data[12:12 + 2 * n], dtype=">i2").astype(np.int16)
    return samples, rate


def pcm_features(samples: np.ndarray) -> tuple[float, int]:
    """(rms, zero_crossings) of an int16 PCM buffer — float64 math,
    deterministic, shared between the Spark kernel and the frozen-
    fixture generator."""
    x = samples.astype(np.float64)
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return rms, zc
