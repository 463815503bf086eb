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

    sh = sh.persist()  # released below once the pair set is materialized
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
    out = (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        # the verified pair set is tiny — materialize it so the shingle
        # cache can be released instead of leaking for the session
        .localCheckpoint()
    )
    sh.unpersist()
    return out


_LSH_P = 2147483647

# verify-stage strategy switch for minhash_lsh_pairs: up to this many
# docs the (id, grams, n) table is broadcast (~150 encoded int64 grams
# per doc -> ~1.2 KB, i.e. <= ~240 MB at the cap); beyond it the verify
# runs as shuffle joins behind the exact size-ratio prefilter. A
# row-count switch, deliberately not tied to local core count.
_BROADCAST_VERIFY_DOCS = 200_000


def _splitmix64(n: int, salt: int = 0) -> list[int]:
    """Deterministic pseudo-random 64-bit stream — the shared splitmix64
    (functions/hashing.py, single definition for all kernels)."""
    from ..functions.hashing import splitmix64_stream

    return splitmix64_stream(n, salt)


_POLY_B = 131  # Horner base for word/gram hashing (arrays stay int64)
_WS_CODEPOINTS = (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C)
_SEP = 0  # U+0000 batch-concat separator (never appears in text)


def _mix64(x: "np.ndarray") -> "np.ndarray":  # noqa: F821
    """Vectorized splitmix64 finalizer over uint64 — the shared
    definition (functions/hashing.py); wraparound is the defined
    semantics, no undefined overflow."""
    from ..functions.hashing import splitmix64

    return splitmix64(x)


def _batch_minhash_features(
    texts, shingle_words: int, char_k: int, n_word_hashes: int, n_char_hashes: int
):
    """Pure-numpy batch kernel: (word_sigs, char_sigs) MinHash matrices
    for a list of texts — NO per-shingle (or per-word, or per-gram)
    Python. The whole batch is concatenated into one codepoint array
    (U+0000-separated); word hashes come from a Horner column sweep
    over token positions, shingle/gram hashes from vectorized Horner
    chains, and the per-doc MinHash from ``np.minimum.reduceat`` over
    doc segment offsets.

    MinHash over a multiset equals MinHash over its distinct set (min
    is idempotent), so no dedup pass is needed.

    Docs that produce zero shingles under a family (fewer than
    ``shingle_words`` whitespace tokens — the CJK/unsegmented case —
    or shorter than ``char_k`` chars) get one synthetic whole-text
    hash so their band keys only collide on identical text; the OTHER
    family still generates real candidates for them (char k-grams need
    no whitespace — the ADVICE-flagged CJK recall fix).
    """
    import numpy as np

    P = _LSH_P
    B = _POLY_B

    # U+0000 is the batch-concat separator; a NUL inside document text
    # would shift every downstream doc boundary (shape mismatch in the
    # executor). Strip it — candidate-stage only, the exact Jaccard
    # verify stage sees the original text (ADVICE r3).
    texts = ["" if t is None else t.replace("\x00", "") for t in texts]
    n_docs = len(texts)
    joined = "\x00".join(texts) + "\x00"
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sep_pos = np.flatnonzero(cp == _SEP)
    doc_end = sep_pos  # doc d spans [doc_start[d], doc_end[d])
    doc_start = np.concatenate(([0], sep_pos[:-1] + 1))
    doc_of_pos = np.searchsorted(doc_end, np.arange(len(cp)), side="right")

    # ---- family 1: word `shingle_words`-shingles --------------------
    is_ws = np.isin(cp, _WS_CODEPOINTS) | (cp == _SEP)
    tok_mask = ~is_ws
    edge = np.diff(tok_mask.astype(np.int8), prepend=0, append=0)
    tok_start = np.flatnonzero(edge == 1)
    tok_len = np.flatnonzero(edge == -1) - tok_start
    # Horner sweep over character positions (loop bounded by the longest
    # token, vectorized across all tokens in the batch)
    wh = np.zeros(len(tok_start), dtype=np.int64)
    max_len = int(tok_len.max()) if len(tok_len) else 0
    for j in range(min(max_len, 64)):  # 64-char cap: determinism-only truncation
        live = tok_len > j
        wh[live] = (wh[live] * B + cp[tok_start[live] + j]) % P
    tok_doc = doc_of_pos[tok_start] if len(tok_start) else np.zeros(0, dtype=np.int64)
    # adjacent-word shingle hash chains (Horner over word hashes)
    n_tok = len(wh)
    if n_tok >= shingle_words:
        sh_h = wh[: n_tok - shingle_words + 1].copy()
        for j in range(1, shingle_words):
            sh_h = (sh_h * B + wh[j : n_tok - shingle_words + 1 + j]) % P
        same_doc = tok_doc[: n_tok - shingle_words + 1] == tok_doc[shingle_words - 1 :]
        sh_h, sh_doc = sh_h[same_doc], tok_doc[: n_tok - shingle_words + 1][same_doc]
    else:
        sh_h = np.zeros(0, dtype=np.int64)
        sh_doc = np.zeros(0, dtype=np.int64)

    # ---- family 2: char k-grams ------------------------------------
    n_pos = len(cp) - char_k  # last window always holds the trailing sep
    if n_pos > 0:
        ch = cp[:n_pos].copy()
        for j in range(1, char_k):
            ch = (ch * B + cp[j : n_pos + j]) % P
        csum = np.cumsum(cp == _SEP)
        upper = csum[char_k - 1 : char_k - 1 + n_pos]
        lower = np.concatenate(([0], csum[: n_pos - 1]))
        in_doc = (upper - lower) == 0  # no separator inside the window
        ch, ch_doc = ch[in_doc], doc_of_pos[:n_pos][in_doc]
    else:
        ch = np.zeros(0, dtype=np.int64)
        ch_doc = np.zeros(0, dtype=np.int64)

    # ---- synthetic whole-text hash for empty families ---------------
    def _whole_text_hash(d: int) -> int:
        h = 0
        for c in texts[d][:256]:
            h = (h * B + ord(c)) % P
        return h or 1

    def _minhash(hs, hdoc, n_h, salt_a, salt_b):
        A = np.array([v % (P - 1) + 1 for v in _splitmix64(n_h, salt_a)], dtype=np.int64)
        Bc = np.array([v % P for v in _splitmix64(n_h, salt_b)], dtype=np.int64)
        counts = np.bincount(hdoc, minlength=n_docs)
        missing = np.flatnonzero(counts == 0)
        if len(missing):
            hs = np.concatenate([hs, [ _whole_text_hash(int(d)) for d in missing ]])
            hdoc = np.concatenate([hdoc, missing])
            order = np.argsort(hdoc, kind="stable")
            hs, hdoc = hs[order], hdoc[order]
            counts = np.bincount(hdoc, minlength=n_docs)
        offsets = np.concatenate(([0], np.cumsum(counts[:-1])))
        # (n_h, n_shingles) probe matrix built with in-place ops — one
        # temporary instead of three (identical values; ~25% off the
        # kernel's dominant step at bench chunk sizes)
        probes = np.multiply(A[:, None], hs[None, :])
        probes += Bc[:, None]
        probes %= P
        return np.minimum.reduceat(probes, offsets, axis=1).T  # (n_docs, n_h)

    word_sig = _minhash(sh_h, sh_doc, n_word_hashes, 1, 2)
    char_sig = _minhash(ch, ch_doc, n_char_hashes, 11, 12)
    return word_sig, char_sig


def _gram3_encode_py(t: str) -> int:
    """Injective int64 encoding of one <=3-char gram: 21 bits per
    codepoint (max Unicode codepoint 0x10FFFF < 2^21), offset by +1 so
    an absent position (0) differs from any real char. Max value
    ~2^62.1 — always a positive int64."""
    c0 = (ord(t[0]) + 1) if len(t) > 0 else 0
    c1 = (ord(t[1]) + 1) if len(t) > 1 else 0
    c2 = (ord(t[2]) + 1) if len(t) > 2 else 0
    return (c0 << 42) | (c1 << 21) | c2


def _batch_gram3_sets(texts, cp, doc_start, doc_end):
    """Distinct char-3-grams per doc, injectively encoded to int64 —
    the EXACT verify representation. Encoding is ``_gram3_encode_py``
    vectorized over the batch codepoint array: because the map
    gram-string -> int64 is injective, |A ∩ B| and |A| computed on the
    encoded sets equal the string-set values exactly, so the verify
    jaccard is bit-identical to the DuckDB oracle's string scan while
    the arrays shuffle as fixed-width longs (~4x fewer bytes than
    per-gram strings, and array_intersect compares longs, not strings).

    Mirrors ``{t[j:j+3] for j in range(max(len(t)-2, 1))}``: docs of
    length >= 3 contribute every full window; shorter docs contribute
    the single (possibly empty) prefix gram ``t[0:3]``.

    Returns a list of sorted np.int64 arrays, one per doc.
    """
    import numpy as np

    n_docs = len(doc_start)
    n_pos = len(cp) - 2
    if n_pos > 0:
        g = (
            ((cp[:n_pos] + 1) << 42)
            | ((cp[1 : n_pos + 1] + 1) << 21)
            | (cp[2 : n_pos + 2] + 1)
        )
        # window must not cross a separator (cp==0 at separators makes
        # the +1 offsets safe: a separator contributes 1<<42 etc., but
        # such windows are masked out here anyway)
        in_doc = (cp[:n_pos] != _SEP) & (cp[1 : n_pos + 1] != _SEP) & (
            cp[2 : n_pos + 2] != _SEP
        )
        g = g[in_doc]
        gdoc = np.searchsorted(doc_end, np.flatnonzero(in_doc), side="right")
    else:
        g = np.zeros(0, dtype=np.int64)
        gdoc = np.zeros(0, dtype=np.int64)

    # short docs (len < 3) have no full window: single prefix gram
    doc_len = doc_end - doc_start
    short = np.flatnonzero(doc_len < 3)
    if len(short):
        sg = np.array(
            [_gram3_encode_py(texts[int(d)][:3]) for d in short], dtype=np.int64
        )
        g = np.concatenate([g, sg])
        gdoc = np.concatenate([gdoc, short])

    # per-doc distinct: sort by (doc, gram), drop adjacent dupes
    order = np.lexsort((g, gdoc))
    g, gdoc = g[order], gdoc[order]
    keep = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        keep[1:] = (g[1:] != g[:-1]) | (gdoc[1:] != gdoc[:-1])
    g, gdoc = g[keep], gdoc[keep]
    counts = np.bincount(gdoc, minlength=n_docs)
    return np.split(g, np.cumsum(counts[:-1]))


def _gram3_sets(texts):
    """Distinct encoded 3-gram sets for a list of ORIGINAL texts.
    Vectorized over a NUL-joined codepoint array; the rare doc that
    itself contains U+0000 (which would corrupt the join boundaries)
    is recomputed exactly, per doc, from its original string."""
    import numpy as np

    clean = ["" if t is None else t.replace("\x00", "") for t in texts]
    joined = "\x00".join(clean) + "\x00"
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sep_pos = np.flatnonzero(cp == _SEP)
    doc_end = sep_pos
    doc_start = np.concatenate(([0], sep_pos[:-1] + 1))
    sets = _batch_gram3_sets(clean, cp, doc_start, doc_end)
    for i, t in enumerate(texts):
        if t is not None and "\x00" in t:
            sets[i] = np.unique(
                np.array(
                    [_gram3_encode_py(t[j : j + 3]) for j in range(max(len(t) - 2, 1))],
                    dtype=np.int64,
                )
            )
    return sets


def _band_keys(sig, bands: int, band_offset: int):
    """(n_docs, bands) int64 keys: uint64 splitmix chain over each
    band's signature rows, salted by the global band index so keys from
    different bands/families never collide by construction."""
    import numpy as np

    n_docs, n_h = sig.shape
    rows = n_h // bands
    sig_u = sig.astype(np.uint64).reshape(n_docs, bands, rows)
    keys = np.empty((n_docs, bands), dtype=np.uint64)
    for b in range(bands):
        k = np.full(n_docs, np.uint64(band_offset + b + 1))
        for r in range(rows):
            k = _mix64(k + sig_u[:, b, r])
        keys[:, b] = k
    return keys.view(np.int64)


def _minhash_kernel(
    docs: DataFrame, id_col: str, text_col: str,
    n_hashes: int, bands: int, shingle_words: int,
    char_k: int = 7, char_bands: int = 12, char_rows: int = 4,
) -> DataFrame:
    """(id, sh, n_sh, bk) via mapInPandas.

    * ``sh``: the distinct char-3-gram set, injectively encoded to
      int64 (``_gram3_encode_py``) — the EXACT verify metric (same set
      cardinalities as the string grams the DuckDB oracle scans, per
      injectivity), shuffled as fixed-width longs instead of strings.
    * ``bk``: band keys from TWO OR-composed MinHash families —
      ``bands`` keys over **word ``shingle_words``-shingles** plus
      ``char_bands`` keys over **char ``char_k``-grams**. A pair is a
      candidate if ANY band key matches; exact verify keeps precision.

    Why two families: on low-entropy corpora char-3-gram sets overlap
    heavily between unrelated docs (this testdata: median organic
    3-gram jaccard 0.46), so banding over the verify metric degenerates
    toward all-pairs. Word-2-shingles separate cleanly (organic max
    ~0.15 vs planted min ~0.9) — but collapse on unsegmented (CJK) text
    and on dense in-word edits (char-jaccard high, word-sim ~0.5). Char
    7-grams separate there too (organic mean 0.065 / p99 0.13 at sf0.1
    vs edit-pair ~0.74+) with a 12x4 S-curve (midpoint 0.54, hit 98.6%
    at j=0.74), covering both word-family blind spots at a measured
    ~0.03% organic candidate rate (~4-6k extra pairs over 12.5M at
    sf0.1 — re-tuned from char-5 whose organic rate was 30x higher on
    the longer sf0.1 docs). All hashing is batch-level numpy (no per-shingle Python) —
    see _batch_minhash_features.
    """
    import pandas as pd

    assert n_hashes % bands == 0, (n_hashes, bands)
    n_char_hashes = char_bands * char_rows

    # sub-chunking keeps the probes matrix (n_hashes x total_grams)
    # inside CPU cache: one monolithic 10k-doc Arrow batch would churn
    # ~2 GB of int64 temporaries and run ~7x slower than 256-doc chunks
    CHUNK = 256

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            for lo in range(0, len(pdf), CHUNK):
                sub = pdf.iloc[lo:lo + CHUNK]
                if len(sub) == 0:
                    continue
                texts = ["" if t is None else t for t in sub[text_col]]
                word_sig, char_sig = _batch_minhash_features(
                    texts, shingle_words, char_k, n_hashes, n_char_hashes
                )
                wk = _band_keys(word_sig, bands, 0)
                ck = _band_keys(char_sig, char_bands, bands)
                bk = np.concatenate([wk, ck], axis=1)
                shs = _gram3_sets(texts)
                yield pd.DataFrame({
                    "id": sub[id_col].to_numpy(),
                    "sh": shs,
                    "bk": list(bk),
                })

    # the id column keeps its input type (long doc ids, string image ids)
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"id {id_type}, sh array<long>, bk array<long>"
    spark = docs.sparkSession
    return (
        docs.select(F.col(id_col), F.col(text_col))
        # explicit repartition: AQE coalesces by byte size and would run
        # the python-compute kernel on 1-2 partitions otherwise. Hash by
        # the unique id (not round-robin): keyless repartition pays a
        # local sort of every row first (sortBeforeRepartition, guide
        # §2.5); hashing a unique key spreads identically without it
        .repartition(spark.sparkContext.defaultParallelism, F.col(id_col))
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

    Candidates come from the UNION of two OR-composed families (see
    _minhash_kernel): word-shingle bands (8x3, S-curve midpoint 0.5 —
    an edit-derived near-dup at word-sim >= ~0.8 is missed w.p.
    <= (1-0.8^3)^8 ~ 5e-3 while unrelated pairs at <= ~0.15 collide
    w.p. <= 8*0.15^3 ~ 2.7%) plus char-7-gram bands (12x4, midpoint
    0.54) that cover the word family's two blind spots: unsegmented
    (CJK) text, where whitespace tokenization collapses to one shingle,
    and dense in-word edits, where char-jaccard stays high but word-sim
    drops to ~0.3-0.5. Either family matching makes a candidate; the exact
    verify keeps precision at 1, so extra candidates only cost the
    near-linear verify join. At 100 TB the grams for the verify stage
    would be re-derived per candidate instead of carried through the
    persist; at bench scale carrying them is cheaper.
    """
    assert n_hashes % bands == 0, (n_hashes, bands)
    sig = _minhash_kernel(docs, id_col, text_col, n_hashes, bands, shingle_words).persist()
    # populate the cache with ONE pass before the self-join fans out:
    # the banded join's two scan stages run concurrently, and racing an
    # unpopulated cache computed the python kernel twice (r7: +4 s at
    # sf1.0). The count also sizes the verify strategy below.
    n_docs = sig.count()

    banded = sig.select("id", F.posexplode("bk").alias("band", "key"))

    # Candidate pairs are (id, id) ONLY — carrying the shingle arrays
    # through the bucket shuffle is what kills this shape (each row
    # would drag ~KBs of payload through an exchange). Dedup the skinny
    # pairs, then re-attach shingles from the cached sig df.
    # Bucket-grouped pair expansion, not a self-join: a (band, key)
    # self-join shuffles the banded frame TWICE (no exchange reuse —
    # the two join inputs canonicalize differently) and builds a hash
    # relation per partition; one groupBy + an in-bucket id-pair
    # explode produces the identical pair multiset off a SINGLE
    # exchange (r7 A/B at sf1.0, 1M banded rows -> 700k candidates:
    # med 1.30 s self-join vs 0.86 s grouped; outputs equal). Bucket
    # sizes are bounded by the S-curve tuning, so the per-row explode
    # is never quadratic-hot; collect_list aggregates map-side.
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        buckets.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = sig.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                      F.col("n_sh").alias("n_a"))
    sh_b = sig.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                      F.col("n_sh").alias("n_b"))
    # size-adaptive verify (row-count switch, not a core-count tune):
    # * small corpus: broadcast the gram table — neither verify join
    #   shuffles, so no candidate row drags an array through an
    #   exchange (guide §8: decide on small rows, move payloads once);
    # * large corpus (the 100 TB shape): the gram table cannot be
    #   broadcast — first drop candidates that provably cannot pass
    #   (jaccard >= t implies |A∩B| <= min(|A|,|B|), so min/max size
    #   ratio >= t: the exact containment bound) via skinny size joins,
    #   THEN shuffle arrays only for the surviving pairs.
    ratio_ok = F.least("n_a", "n_b") >= F.lit(threshold) * F.greatest("n_a", "n_b")
    if n_docs <= _BROADCAST_VERIFY_DOCS:
        pairs = (
            cand.join(F.broadcast(sh_a), "id_a")
            .join(F.broadcast(sh_b), "id_b")
            .filter(ratio_ok)
        )
    else:
        na = sig.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
        nb = sig.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
        slim = cand.join(na, "id_a").join(nb, "id_b").filter(ratio_ok)
        pairs = (
            slim.join(sh_a.drop("n_a"), "id_a")
            .join(sh_b.drop("n_b"), "id_b")
        )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    out = (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        # the verified pair set is tiny — pin it so the signature cache
        # can be released now instead of leaking for the session
        # (jaccard_pairs release pattern; ADVICE r6)
        .localCheckpoint()
    )
    sig.unpersist()
    return out


def incremental_neardup_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    threshold: float = 0.85,
    n_hashes: int = 24,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 2,
) -> DataFrame:
    """Near-dup gate for INCREMENTAL ingest: probe a new batch against
    an existing corpus without re-pairing the corpus with itself.

    Same two OR-composed MinHash families and exact char-3-gram-Jaccard
    verify as minhash_lsh_pairs (identical recall guarantee — a pair is
    found iff the symmetric all-docs run would find it), but candidates
    come ONLY from batch-band -> corpus-band equi-join probes. Cost is
    O(|batch| x collision rate), independent of |corpus| pairs: at
    100 TB the corpus's banded index (id, band, key) is the thing you
    persist between crawls (it is exactly what this op's corpus side
    computes), so each ingest touches one shuffle of the new rows plus
    a hash join against the index — never corpus x corpus. Returns
    (new_id, corpus_id, jaccard >= threshold).
    """
    assert n_hashes % bands == 0, (n_hashes, bands)
    sig_c = _minhash_kernel(
        corpus, id_col, text_col, n_hashes, bands, shingle_words
    ).persist()
    sig_b = _minhash_kernel(
        batch, id_col, text_col, n_hashes, bands, shingle_words
    ).persist()
    # populate both caches with one pass each before the band join's
    # concurrent scan stages race them (minhash_lsh_pairs r7 fix)
    sig_c.count()
    sig_b.count()

    banded_c = sig_c.select("id", F.posexplode("bk").alias("band", "key"))
    banded_b = sig_b.select("id", F.posexplode("bk").alias("band", "key"))

    # skinny (new_id, corpus_id) candidates; sides are disjoint by the
    # caller's split so no self-pair / ordering predicate is needed
    b, c = banded_b.alias("b"), banded_c.alias("c")
    cand = (
        b.join(
            c,
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.key") == F.col("c.key")),
        )
        .select(F.col("b.id").alias("new_id"), F.col("c.id").alias("corpus_id"))
        .dropDuplicates(["new_id", "corpus_id"])
    )
    sh_b2 = sig_b.select(F.col("id").alias("new_id"), F.col("sh").alias("sh_b"),
                         F.col("n_sh").alias("n_b"))
    sh_c2 = sig_c.select(F.col("id").alias("corpus_id"), F.col("sh").alias("sh_c"),
                         F.col("n_sh").alias("n_c"))
    pairs = cand.join(sh_b2, "new_id").join(sh_c2, "corpus_id")
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    jac = inter / (F.col("n_b") + F.col("n_c") - inter)
    out = (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
        # pin the (tiny) verified gate result, then release both
        # signature caches — repeated ingests in one session must not
        # accumulate cached signature frames (ADVICE r6)
        .localCheckpoint()
    )
    sig_b.unpersist()
    sig_c.unpersist()
    return out


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
    return label_propagate(
        docs.select(F.col(id_col).alias("id")),
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")),
    ).select(F.col("id").alias(id_col), "group_id")


def label_propagate(nodes: DataFrame, pairs: DataFrame) -> DataFrame:
    """Connected components by min-label propagation over an undirected
    pair graph: nodes(id), pairs(a, b) -> (id, group_id) with group_id
    = the component's min id (singletons group with themselves). Each
    round shuffles only (id, label) pairs; converges in O(diameter)
    joins."""
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()

    labels = nodes.select("id").withColumn("label", F.col("id"))
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
    # the loop already ran jobs per round; one more tiny job pins the
    # converged (id, label) table so the final cache can be released
    # rather than leak for the session
    out = labels.select("id", F.col("label").alias("group_id")).localCheckpoint()
    labels.unpersist()
    return out


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: 32-bit simhash, block on 4x 8-bit chunks
    (pigeonhole: hamming<=3 pairs share at least one exact chunk), then
    verify hamming distance."""
    # the simhash32 HOF chain is the heavy map stage — spread it over
    # the session parallelism before computing (single-file inputs
    # otherwise run it on 1-2 scan tasks; same guard _minhash_kernel
    # carries)
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
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
    cand = _bucket_pairs(chunks)
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def _bucket_pairs(chunks: DataFrame) -> DataFrame:
    """(id, h, chunk, val) -> distinct (id_a, id_b, h_a, h_b) pairs
    sharing a (chunk, val) bucket. Bucket-grouped pair expansion (one
    groupBy exchange + in-bucket explode) instead of a self-join on the
    bucket key, which shuffles the chunk frame twice with no exchange
    reuse — the same rewrite minhash_lsh_pairs carries (r7 A/B there:
    med 1.30 -> 0.86 s at sf1.0; pair sets identical by construction)."""
    buckets = (
        chunks.groupBy("chunk", "val")
        .agg(F.collect_list(F.struct("id", "h")).alias("xs"))
        .filter(F.size("xs") > 1)
    )
    return (
        buckets.select(F.explode("xs").alias("a"), "xs")
        .select("a", F.explode("xs").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _phash_chunk_frame(images: DataFrame, n_chunks: int) -> DataFrame:
    """(id, h, chunk, val): the pigeonhole blocking frame shared by the
    symmetric and incremental phash near-dup ops."""
    bounds = [round(64 * c / n_chunks) for c in range(n_chunks + 1)]

    def _chunk_val(c: int):
        width = bounds[c + 1] - bounds[c]
        if width >= 64:  # max_hamming=0: the "chunk" is the whole hash
            return F.col("h")
        return F.shiftright(F.col("h"), bounds[c]).bitwiseAND(F.lit((1 << width) - 1))

    base = images.select(F.col("image_id").alias("id"), F.col("phash").alias("h"))
    return base.select(
        "id",
        "h",
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("chunk"), _chunk_val(c).alias("val"))
                for c in range(n_chunks)
            ])
        ).alias("ck"),
    ).select("id", "h", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val"))


def phash_near_dups(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-dup pairs by 64-bit perceptual hash: block on
    ``max_hamming + 1`` bit-range chunks (pigeonhole: a pair within
    ``max_hamming`` differing bits must share at least one chunk
    exactly), verify with bit_count(xor). Chunk count is derived from
    the threshold so recall is guaranteed for any requested distance."""
    n_chunks = max_hamming + 1
    assert 1 <= n_chunks <= 64, max_hamming
    chunks = _phash_chunk_frame(images, n_chunks)
    cand = _bucket_pairs(chunks)
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def incremental_phash_neardups(
    corpus: DataFrame, batch: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Image twin of incremental_neardup_pairs: probe a NEW image
    batch's phash chunk keys against the corpus's persisted chunk index
    instead of re-pairing the corpus with itself. Same pigeonhole
    blocking as phash_near_dups (recall guaranteed for any
    ``max_hamming``), candidates only from batch-chunk -> corpus-chunk
    equi-joins — O(|batch| x collisions) per ingest, the corpus enters
    only through the index join. The ingest-time re-upload /
    re-encode detector. Returns (new_id, corpus_id, hamming)."""
    n_chunks = max_hamming + 1
    assert 1 <= n_chunks <= 64, max_hamming
    cb = _phash_chunk_frame(batch, n_chunks).alias("b")
    cc = _phash_chunk_frame(corpus, n_chunks).alias("c")
    cand = (
        cb.join(
            cc,
            (F.col("b.chunk") == F.col("c.chunk"))
            & (F.col("b.val") == F.col("c.val")),
        )
        .select(
            F.col("b.id").alias("new_id"),
            F.col("c.id").alias("corpus_id"),
            F.col("b.h").alias("h_b"),
            F.col("c.h").alias("h_c"),
        )
        .dropDuplicates(["new_id", "corpus_id"])
    )
    ham = F.bit_count(F.col("h_b").bitwiseXOR(F.col("h_c")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("new_id", "corpus_id", "hamming")
    )


def crossmodal_dup_groups(
    images: DataFrame,
    max_hamming: int = 10,
    caption_threshold: float | None = None,
) -> DataFrame:
    """(image_id, group_id): connected components over the UNION of
    edge sets on an image+caption table — visual near-dups (64-bit
    phash within ``max_hamming``, pigeonhole-blocked, phash_near_dups),
    caption exact-dups (identical caption string), and — when
    ``caption_threshold`` is set — caption NEAR-dups (MinHash-LSH
    candidates verified at exact char-3-gram jaccard >= threshold, the
    same machinery as document near-dup: minhash_lsh_pairs). The
    cross-modal grouping a training-data pipeline runs before keeping
    one exemplar per group: a re-encoded copy of the same pixels, a
    re-captioned copy of the same text, AND a whitespace/punctuation
    paraphrase of a caption all collapse into one group; a row that
    shares pixels with one group and caption with another BRIDGES them.

    Scale shape: phash edges are pigeonhole-blocked equi-joins (never
    O(n^2)); exact caption edges are a min-id star per caption — one
    hash aggregation on the caption column, |rows| edges max, no
    within-caption quadratic blowup for heavily-duplicated captions;
    near-dup caption edges are banded LSH equi-joins over short caption
    strings (candidates only, no cross product — the exact-caption star
    keeps identical captions out of the quadratic LSH buckets only when
    they differ; identical captions DO collide per-band, so heavy
    exact-dup captions should be deduped upstream or capped via
    max_bucket at planetary scale); the component step shuffles only
    (id, label) pairs (label_propagate).
    """
    base = images.select("image_id", "phash", "caption")
    visual = phash_near_dups(base, max_hamming=max_hamming).select("id_a", "id_b")
    cap = base.filter(F.col("caption").isNotNull())
    cap_root = cap.groupBy("caption").agg(F.min("image_id").alias("root"))
    cap_edges = (
        cap.join(cap_root, "caption")
        .filter(F.col("image_id") != F.col("root"))
        .select(F.col("root").alias("id_a"), F.col("image_id").alias("id_b"))
    )
    edges = visual.unionByName(cap_edges)
    if caption_threshold is not None:
        near_cap = minhash_lsh_pairs(
            cap.select("image_id", "caption"),
            threshold=caption_threshold,
            id_col="image_id",
            text_col="caption",
        ).select("id_a", "id_b")
        edges = edges.unionByName(near_cap)
    pairs = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return label_propagate(
        base.select(F.col("image_id").alias("id")), pairs
    ).select(F.col("id").alias("image_id"), "group_id")


def consensus_near_dups(
    images: DataFrame, max_phash: int = 12, max_dhash: int = 14
) -> DataFrame:
    """Image near-dup pairs confirmed by BOTH perceptual-hash families:
    phash (DCT spectrum) within ``max_phash`` AND dhash (gradient
    signs, functions/imaging.dhash64) within ``max_dhash``. The two
    hashes fail independently — a phash collision between unrelated
    images rarely survives the gradient test — so the conjunction
    trades a little recall at the phash boundary for much higher
    precision, the usual production setting for destructive dedup.

    Input needs (image_id, phash, dhash) columns. Exact w.r.t. its
    contract: candidates come from the phash pigeonhole blocking
    (recall guaranteed for ``max_phash``), and the dhash test is a
    post-filter on that superset — so the returned set IS the full
    conjunction, never a sample.

    100-TB shape: the pigeonhole equi-join generates candidates (never
    all-pairs); the dhash attach is two hash-joins keyed on image id
    against a (id, dhash) projection — broadcast when the image table
    is dimension-sized, shuffle-hash otherwise. No new quadratic stage.
    """
    pairs = phash_near_dups(images, max_hamming=max_phash)
    d = images.select("image_id", "dhash")
    out = (
        pairs.join(
            d.select(
                F.col("image_id").alias("id_a"), F.col("dhash").alias("dh_a")
            ),
            "id_a",
        )
        .join(
            d.select(
                F.col("image_id").alias("id_b"), F.col("dhash").alias("dh_b")
            ),
            "id_b",
        )
        .withColumn(
            "dhash_hamming", F.bit_count(F.col("dh_a").bitwiseXOR(F.col("dh_b")))
        )
        .filter(F.col("dhash_hamming") <= max_dhash)
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("hamming").alias("phash_hamming"),
        "dhash_hamming",
    )


def dup_span_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 128,
    stride: int = 32,
) -> DataFrame:
    """Corpus-wide duplicated-SUBSTRING detection — the distributed
    fingerprint approximation of suffix-array substring dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): fixed-``width`` character windows at a fixed ``stride``
    are fingerprinted with the cross-engine Horner rolling hash
    (textstats.horner_hash — the linear poly_hash's CLT-concentrated
    window sums collided on ~7% of spans at sf0.01, flagging 461 dup
    spans where true string duplication is 262; Horner flags exactly
    the true set, collision expectation ~n^2/2^32); a span is
    DUPLICATED if its fingerprint occurs more than once corpus-wide
    (a doc repeating its own span counts — within-doc repetition is
    duplication too). Per doc: ``n_spans``, ``n_dup_spans`` (span
    occurrences whose fingerprint is duplicated), ``dup_flag``; docs
    shorter than ``width`` have zero spans and ``dup_flag = false``.

    Fingerprints (int64), not the width-char strings, travel through
    the shuffle. A fingerprint collision counts as a duplicate in BOTH
    engines (identical hash both sides) — the documented
    approximation; production would widen the modulus to 64-bit.

    100-TB shape: explode (~len/stride rows per doc) -> groupBy(fp)
    count (map-side combinable) -> equi-join back on fp ->
    groupBy(doc_id). No window, no UDF, no all-pairs stage; a
    boilerplate span shared by millions of docs stays one (fp, cnt)
    row in the count table, and the join only fans back out to the
    occurrences that already exist.

    Default width 128 chars ≈ Lee et al.'s 50-token threshold; on the
    tiny-vocab synthetic documents table narrower windows saturate
    (32-char spans collide organically in 100% of docs — measured),
    while 128/32 keeps organic flags at ~40% and still catches ~96%
    of the planted near-dup docs.
    """
    from .textstats import horner_hash

    t = F.col(text_col)
    positions = F.when(
        F.length(t) >= width,
        F.sequence(
            F.lit(1), F.length(t) - (width - 1), F.lit(int(stride))
        ),
    ).otherwise(F.array().cast("array<int>"))
    fps = F.transform(positions, lambda p: horner_hash(F.substring(t, p, width)))
    spans = docs.select(F.col(id_col), F.explode(fps).alias("fp"))
    cnt = spans.groupBy("fp").agg(F.count("*").alias("cnt"))
    per = (
        spans.join(cnt, "fp")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0).cast("long")).alias(
                "n_dup_spans"
            ),
            (F.coalesce("n_dup_spans", F.lit(0).cast("long")) > 0).alias(
                "dup_flag"
            ),
        )
    )
