"""Regenerate fundcrawler_spark/frozen_frames.py from the live codec.

Run DELIBERATELY (and commit the diff) only when the imaging codec,
phash, or VID1 container semantics change on purpose — the frozen
values are the video_frame_sample oracle's independent side.

    python scripts/freeze_frames.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fundcrawler_spark import fixtures as fx  # noqa: E402
from fundcrawler_spark.functions import imaging  # noqa: E402
from fundcrawler_spark.operators.multimodal import parse_video  # noqa: E402

N_VIDEOS = 24
EVERY_K = 2


def compute_entries() -> list[tuple[str, int, int, int, int]]:
    """(video_id, frame_index, w, h, phash) for every SAMPLED frame
    (indices 0, EVERY_K, 2*EVERY_K, ...) of the N_VIDEOS fixture set."""
    entries = []
    for video_id, blob, _n, _w, _h in fx.video_rows(N_VIDEOS):
        frames = parse_video(blob)
        for idx in range(0, len(frames), EVERY_K):
            arr = imaging.decode_image(frames[idx], "ppm")
            h, w = arr.shape[:2]
            entries.append((video_id, idx, w, h, int(imaging.phash64(arr))))
    return entries


if __name__ == "__main__":
    entries = compute_entries()
    path = os.path.join(
        os.path.dirname(__file__), "..", "fundcrawler_spark", "frozen_frames.py"
    )
    doc = (
        "Frozen expected (video_id, frame_index, w, h, phash) for the\n"
        "sampled frames (every 2nd, starting at 0) of the 24-video VID1\n"
        "fixture set — generated ONCE from the container parser +\n"
        "decode->phash path and committed, so the DuckDB oracle for\n"
        "video_frame_sample is INDEPENDENT of the runtime code path.\n"
        "tests/test_multimodal_ops.py asserts the live pipeline still\n"
        "reproduces these exact values (regenerate deliberately with\n"
        "scripts/freeze_frames.py if semantics change on purpose).\n"
    )
    with open(path, "w") as f:
        f.write(f'"""{doc}"""\n\n# (video_id, frame_index, w, h, phash64)\nFROZEN_FRAME_META = [\n')
        for e in entries:
            f.write(f"    {e!r},\n")
        f.write("]\n")
    print(f"wrote {len(entries)} entries to {path}")
