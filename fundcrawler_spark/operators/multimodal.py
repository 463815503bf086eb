"""Multimodal (image) column kernels — mapInPandas batch plumbing.

Images travel as opaque binary columns with typed metadata
(BASELINE.json input_hint schema). Decode / phash / resize run as
Arrow-batched pandas kernels over our numpy codecs; on a real cluster
the same plumbing would call Pillow/turbojpeg inside the batch fn —
the Spark-side shape (schema, partitioning, batch signature) is what
this module makes real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import imaging
from ..schemas import IMAGES_SCHEMA


def detect_fmt(data: bytes) -> str | None:
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"DCQ1":
        return "dctq"
    return None


def enrich_images(df: DataFrame) -> DataFrame:
    """(image_id, bytes[, caption]) -> full IMAGES_SCHEMA rows: decode
    each payload, record (w, h, fmt), compute the 64-bit DCT phash."""
    has_caption = "caption" in df.columns
    in_cols = ["image_id", "bytes"] + (["caption"] if has_caption else [])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = pdf["image_id"], pdf["bytes"]
            caps = pdf["caption"] if has_caption else pd.Series([None] * len(pdf))
            out = {"image_id": [], "bytes": [], "w": [], "h": [],
                   "fmt": [], "caption": [], "phash": []}
            for i, (iid, blob, cap) in enumerate(zip(ids, blobs, caps)):
                data = bytes(blob) if blob is not None else b""
                fmt = detect_fmt(data) if data else None
                if fmt is None:
                    arr, w, h, ph = None, None, None, None
                else:
                    arr = imaging.decode_image(data, fmt)
                    h, w = arr.shape[:2]
                    ph = imaging.phash64(arr)
                out["image_id"].append(iid)
                out["bytes"].append(data or None)
                out["w"].append(w)
                out["h"].append(h)
                out["fmt"].append(fmt)
                out["caption"].append(cap)
                out["phash"].append(ph)
            o = pd.DataFrame(out)
            o["w"] = o["w"].astype("Int32")
            o["h"] = o["h"].astype("Int32")
            o["phash"] = o["phash"].astype("Int64")
            yield o

    # explicit repartition: AQE coalesces by byte size, but this stage's
    # cost is python decode+phash per row — a wave-sized batch would
    # collapse to 1-2 partitions and run serially otherwise
    spark = df.sparkSession
    return (
        df.select(*in_cols)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(kernel, IMAGES_SCHEMA)
    )


def phash_hamming(col_a, col_b):
    """Hamming distance between two 64-bit phashes — JVM-side bit_count
    of xor, no Python (SURVEY.md §2.7)."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def decode_stub_other_formats(data: bytes, fmt: str) -> np.ndarray:
    """Plumbing stub for codecs absent in this container (jpeg/png/webp
    decode would live here via Pillow). Kept explicit per the build
    brief: the Spark-side plumbing is real; the codec is not."""
    raise NotImplementedError(
        f"codec '{fmt}' requires an image library not present in this "
        "container; ppm/bmp/dctq are implemented in functions/imaging.py"
    )
