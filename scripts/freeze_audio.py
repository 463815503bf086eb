"""Regenerate fundcrawler_spark/frozen_audio.py from the live codec.

Run DELIBERATELY (and commit the diff) only when the AUD1 codec or the
feature math changes on purpose — the frozen values are the
audio_features oracle's independent side.

    python scripts/freeze_audio.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fundcrawler_spark import fixtures as fx  # noqa: E402
from fundcrawler_spark.functions.audio import decode_audio, pcm_features  # noqa: E402

N_AUDIO = 32


def compute_entries() -> list[tuple[str, int, int, float, int]]:
    """(audio_id, sample_rate, n_samples, rms, zero_crossings) for the
    N_AUDIO fixture set."""
    entries = []
    for audio_id, blob, _rate, _n in fx.audio_rows(N_AUDIO):
        samples, rate = decode_audio(blob)
        rms, zc = pcm_features(samples)
        entries.append((audio_id, rate, len(samples), rms, zc))
    return entries


if __name__ == "__main__":
    entries = compute_entries()
    path = os.path.join(
        os.path.dirname(__file__), "..", "fundcrawler_spark", "frozen_audio.py"
    )
    doc = (
        "Frozen expected (audio_id, sample_rate, n_samples, rms,\n"
        "zero_crossings) for the 32-clip AUD1 fixture set — generated\n"
        "ONCE from the codec + shared pcm_features math and committed,\n"
        "so the DuckDB oracle for audio_features is INDEPENDENT of the\n"
        "runtime code path. tests/test_multimodal_ops.py asserts the\n"
        "live pipeline still reproduces these exact values (regenerate\n"
        "deliberately with scripts/freeze_audio.py on purposeful\n"
        "change). rms values are float64 repr round-trips — bit-exact\n"
        "on both engines.\n"
    )
    with open(path, "w") as f:
        f.write(
            f'"""{doc}"""\n\n'
            "# (audio_id, sample_rate, n_samples, rms, zero_crossings)\n"
            "FROZEN_AUDIO_META = [\n"
        )
        for e in entries:
            f.write(f"    {e!r},\n")
        f.write("]\n")
    print(f"wrote {len(entries)} entries to {path}")
