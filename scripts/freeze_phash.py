"""Regenerate fundcrawler_spark/frozen_phash.py from the live codec.

Run DELIBERATELY (and commit the diff) only when the imaging codec or
phash semantics change on purpose — the frozen values are the oracle's
independent side; silently regenerating them would defeat the point.

    python scripts/freeze_phash.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fundcrawler_spark import fixtures as fx  # noqa: E402
from fundcrawler_spark.functions import imaging  # noqa: E402


def compute_entries() -> list[tuple[str, int, int, str, int]]:
    rows = fx.image_rows(64)
    entries = []
    for r in rows:
        arr = imaging.decode_image(bytes(r[1]), r[4])
        entries.append((r[0], r[2], r[3], r[4], int(imaging.phash64(arr))))
    for i in range(0, 64, 8):
        r = rows[i]
        arr = imaging.decode_image(bytes(r[1]), r[4])
        rt = imaging.decode_image(bytes(imaging.encode_image(arr, "dctq")), "dctq")
        entries.append((f"dup_{r[0]}", r[2], r[3], "dctq", int(imaging.phash64(rt))))
    return entries


if __name__ == "__main__":
    import fundcrawler_spark.frozen_phash as fp

    entries = compute_entries()
    doc = fp.__doc__
    path = os.path.join(os.path.dirname(fp.__file__), "frozen_phash.py")
    with open(path, "w") as f:
        f.write(f'"""{doc}"""\n\n# (image_id, w, h, fmt, phash64)\nFROZEN_IMAGE_META = [\n')
        for e in entries:
            f.write(f"    {e!r},\n")
        f.write("]\n")
    print(f"wrote {len(entries)} entries to {path}")
