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
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard similar pairs via shingle inverted index
    (explode -> self-join on shingle -> count intersections). Never
    materializes the full cross product.

    ``max_df`` enables document-frequency pruning for corpus scale: the
    inverted-index join costs sum over grams of df^2, and a handful of
    stop-grams (df ~ n) dominate it quadratically. With ``max_df`` set,
    candidate pairs come only from grams with df <= max_df; the
    jaccard is then computed EXACTLY on the full gram arrays of the
    candidates (precision stays 1). Recall heuristic, documented: an
    edit-derived near-dup pair shares its rare grams, so pruning
    high-df grams keeps threshold-grade pairs while cutting the join
    cost from O(sum df^2) to O(sum_{df<=max_df} df^2)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), shingle_n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    if max_df is None:
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
        return inter.withColumn("jaccard", jac).filter(
            F.col("jaccard") >= threshold
        ).select("id_a", "id_b", "jaccard")

    sh = sh.persist()
    inv = sh.select("id", F.explode("sh").alias("g"))
    rare = (
        inv.groupBy("g").count().filter(F.col("count") <= max_df).select("g")
    )
    pruned = inv.join(rare, "g")
    a, b = pruned.alias("a"), pruned.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = cand.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                  F.col("n_sh").alias("n_a")), "id_a"
    ).join(
        sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                  F.col("n_sh").alias("n_b")), "id_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


_LSH_P = 2147483647


def _splitmix64(n: int, salt: int = 0) -> list[int]:
    """Deterministic pseudo-random 64-bit stream (splitmix64) — fixed
    constants, no RNG-library version dependence."""
    out, x = [], (salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    for _ in range(n):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out.append(z ^ (z >> 31))
    return out


def _minhash_kernel(
    docs: DataFrame, id_col: str, text_col: str,
    n_hashes: int, bands: int, shingle_words: int,
) -> DataFrame:
    """(id, sh, n_sh, bk) via mapInPandas.

    * ``sh``: the distinct char-3-gram array — the EXACT verify metric
      (same definition the DuckDB oracle scans).
    * ``bk``: ``bands`` packed int64 band keys of a MinHash signature
      over **word ``shingle_words``-shingles**, hashed with crc32 and a
      splitmix64-derived (a*h+b) mod p family.

    Why word shingles for the candidate stage: on low-entropy corpora
    char-3-gram sets overlap heavily between unrelated docs (this
    testdata: median organic 3-gram jaccard 0.46), so banding over the
    verify metric degenerates toward all-pairs no matter the (b, r)
    choice. Word-2-shingle similarity keeps the same ordering on
    edit-derived near-dups (organic max ~0.15 vs planted min ~0.9 here)
    and gives the S-curve a real gap to cut. The previous family
    (a_i=2i+1 — probe 0 is the identity) also collapsed to ~7 distinct
    values per probe; splitmix64 multipliers fix that.
    """
    import numpy as np
    import pandas as pd
    from zlib import crc32

    P = _LSH_P
    rows_per_band = n_hashes // bands
    A = np.array([v % (P - 1) + 1 for v in _splitmix64(n_hashes, 1)], dtype=np.int64)
    B = np.array([v % P for v in _splitmix64(n_hashes, 2)], dtype=np.int64)
    # band-key packing: polynomial fold of the band's rows, collisions
    # only add candidates (exact verify keeps correctness)
    PACK = np.int64(1_000_003)
    M61 = np.int64((1 << 61) - 1)

    def kernel(batches):
        for pdf in batches:
            ids, shs, bks = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = t or ""
                n3 = max(len(t) - 2, 1)
                grams = list({t[j:j + 3] for j in range(n3)})
                words = t.split()
                if len(words) >= shingle_words:
                    shingles = {
                        " ".join(words[j:j + shingle_words])
                        for j in range(len(words) - shingle_words + 1)
                    }
                else:
                    shingles = {t}
                hs = np.fromiter(
                    (crc32(s.encode("utf-8")) for s in shingles),
                    dtype=np.int64, count=len(shingles),
                ) % P
                sig = ((hs[None, :] * A[:, None] + B[:, None]) % P).min(axis=1)
                bands_sig = sig.reshape(bands, rows_per_band)
                key = np.zeros(bands, dtype=np.int64)
                for r in range(rows_per_band):
                    key = (key * PACK + bands_sig[:, r]) % M61
                ids.append(i)
                shs.append(grams)
                bks.append(key.tolist())
            yield pd.DataFrame({"id": ids, "sh": shs, "bk": bks})

    out_schema = "id long, sh array<string>, bk array<long>"
    spark = docs.sparkSession
    return (
        docs.select(F.col(id_col), F.col(text_col))
        # explicit repartition: AQE coalesces by byte size and would run
        # the python-compute kernel on 1-2 partitions otherwise
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(kernel, out_schema)
        .withColumn("n_sh", F.size("sh"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.85,
    n_hashes: int = 24,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 2,
) -> DataFrame:
    """MinHash -> LSH banding -> candidate pairs -> exact-Jaccard
    verification. Output identical shape to jaccard_pairs (pairs with
    char-3-gram jaccard >= threshold).

    Candidate recall is over word-shingle similarity with S-curve
    midpoint (1/bands)^(1/r): the default 8 bands x 3 rows sits at 0.5
    — an edit-derived near-dup pair (word-shingle sim >= ~0.8) is
    missed with probability <= (1-0.8^3)^8 ~ 5e-3, while unrelated
    pairs (sim <= ~0.15) collide with probability <= 8*(0.15)^3 ~ 2.7%
    -> the verify stage touches a near-linear candidate set instead of
    the O(n^2) cross product. At 100 TB the grams for the verify stage
    would be re-derived per candidate instead of carried through the
    persist; at bench scale carrying them is cheaper.
    """
    assert n_hashes % bands == 0, (n_hashes, bands)
    sig = _minhash_kernel(docs, id_col, text_col, n_hashes, bands, shingle_words).persist()

    banded = sig.select("id", F.posexplode("bk").alias("band", "key"))

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


def neardup_groups(
    docs: DataFrame,
    threshold: float = 0.85,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, group_id): connected components over the near-dup pair
    graph — the dedup-group step a production pipeline runs after pair
    finding (keeper = min id per group; singletons group with
    themselves).

    Min-label propagation: each round every node takes the min label
    among itself and its neighbors; converges in O(graph diameter)
    rounds — near-dup components are edit-clusters with tiny diameter,
    so this is 2-4 joins in practice. Each round shuffles only
    (id, label) pairs; the text never enters the loop. (The
    large-star/small-star variant would cut rounds to O(log d) at
    planetary scale; diameter-bounded propagation is the right cost
    here and is exactly the fixpoint a SQL transitive closure
    reaches, which is what the oracle checks.)"""
    pairs = minhash_lsh_pairs(docs, threshold, id_col=id_col, text_col=text_col)
    fwd = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = fwd.unionByName(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()

    labels = docs.select(F.col(id_col).alias("id")).withColumn("label", F.col("id"))
    while True:
        labels = labels.persist()
        nbr_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        nxt = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            nxt.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = nxt
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("group_id"))


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
    """Image near-dup pairs by 64-bit perceptual hash: block on
    ``max_hamming + 1`` bit-range chunks (pigeonhole: a pair within
    ``max_hamming`` differing bits must share at least one chunk
    exactly), verify with bit_count(xor). Chunk count is derived from
    the threshold so recall is guaranteed for any requested distance."""
    n_chunks = max_hamming + 1
    assert 1 <= n_chunks <= 64, max_hamming
    bounds = [round(64 * c / n_chunks) for c in range(n_chunks + 1)]

    def _chunk_val(c: int):
        width = bounds[c + 1] - bounds[c]
        if width >= 64:  # max_hamming=0: the "chunk" is the whole hash
            return F.col("h")
        return F.shiftright(F.col("h"), bounds[c]).bitwiseAND(F.lit((1 << width) - 1))

    base = images.select(F.col("image_id").alias("id"), F.col("phash").alias("h"))
    chunks = base.select(
        "id",
        "h",
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("chunk"), _chunk_val(c).alias("val"))
                for c in range(n_chunks)
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
