"""Regenerate fundcrawler_spark/frozen_blur.py — the independent
oracle side for the images_blur query.

The blur math here is a PURE-PYTHON reimplementation (loops over
decoded pixel lists, no numpy on the scoring path), so a regression in
operators/multimodal.blur_scores or imaging.laplacian_blur_var shifts
the engine side only and the frozen oracle catches it. Exactness is by
construction: luma/Laplacian/sums are exact integer arithmetic on both
sides, and the final float ops (two divisions, one multiply, one
subtract) happen in the same order on the same exact-int operands.

Run DELIBERATELY (and commit the diff) only when the blur semantics
change on purpose:

    python scripts/freeze_blur.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fundcrawler_spark import fixtures as fx  # noqa: E402
from fundcrawler_spark.functions import imaging  # noqa: E402


def pure_python_blur_var(pixels: list[list[list[int]]]) -> float:
    """Variance of 4-neighbor Laplacian over integer luma — loop
    reimplementation of imaging.laplacian_blur_var."""
    h = len(pixels)
    w = len(pixels[0])
    g = [
        [
            (299 * px[0] + 587 * px[1] + 114 * px[2]) // 1000
            for px in row
        ]
        for row in pixels
    ]
    if h < 3 or w < 3:
        return 0.0
    n = 0
    s = 0
    ss = 0
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            lap = (
                4 * g[i][j]
                - g[i - 1][j]
                - g[i + 1][j]
                - g[i][j - 1]
                - g[i][j + 1]
            )
            n += 1
            s += lap
            ss += lap * lap
    mean = float(s) / n
    return float(ss) / n - mean * mean


def compute_entries() -> list[tuple[str, int, int, float]]:
    entries = []
    for r in fx.image_rows(64):
        arr = imaging.decode_image(bytes(r[1]), r[4])
        pixels = [
            [[int(c) for c in arr[i, j]] for j in range(arr.shape[1])]
            for i in range(arr.shape[0])
        ]
        entries.append((r[0], r[2], r[3], pure_python_blur_var(pixels)))
    return entries


if __name__ == "__main__":
    entries = compute_entries()
    path = os.path.join(
        os.path.dirname(__file__), "..", "fundcrawler_spark", "frozen_blur.py"
    )
    with open(path, "w") as f:
        f.write(
            '"""Frozen expected (image_id, w, h, blur_var) for the\n'
            "64-image deterministic fixture set — generated ONCE by\n"
            "scripts/freeze_blur.py's pure-Python Laplacian-variance\n"
            "reimplementation (independent of the numpy engine kernel)\n"
            "and committed, so the DuckDB images_blur oracle catches an\n"
            "engine-side blur/luma/decode regression. blur_var is over\n"
            "DECODED pixels (post lossy round-trip for dctq), exactly\n"
            'what operators/multimodal.blur_scores computes."""\n\n'
            "# (image_id, w, h, blur_var)\n"
            "FROZEN_BLUR_META = [\n"
        )
        for e in entries:
            f.write(f"    {e!r},\n")
        f.write("]\n")
    print(f"wrote {len(entries)} entries to {os.path.normpath(path)}")
