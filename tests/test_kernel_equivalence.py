"""Arrow-kernel variants must be bit-identical to their oracle-parity
Column-math definitions (the kernels exist only because JVM higher-order
functions are interpreted per-element)."""

from pyspark.sql import functions as F

from fundcrawler_spark.operators.textstats import (
    doc_fingerprint,
    doc_fingerprint_kernel,
)

SF = "/root/testdata/sf0.001"


def test_doc_fingerprint_kernel_equals_column_math(spark):
    rows = [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, "abcd"),
            (5, "汉字测试文本"), (6, "x" * 5000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col = {r["doc_id"]: r["fp"]
           for r in df.select("doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    ker = {r["doc_id"]: r["fp"] for r in doc_fingerprint_kernel(df).collect()}
    assert col == ker

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    c2 = {r["doc_id"]: r["fp"]
          for r in docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    k2 = {r["doc_id"]: r["fp"] for r in doc_fingerprint_kernel(docs).collect()}
    assert c2 == k2


def test_batch_minhash_features_equal_per_doc_reference():
    """The fully-vectorized LSH feature kernel (one codepoint array per
    batch, Horner column sweeps, minimum.reduceat) must match a
    straightforward per-doc / per-shingle Python reference — including
    CJK (no whitespace), empty, and shorter-than-k docs. Driver-side
    (no Spark): the kernel is pure numpy."""
    import re

    from fundcrawler_spark.operators.dedup import (
        _LSH_P as P,
        _POLY_B as B,
        _batch_minhash_features,
        _splitmix64,
    )

    def poly(s):
        h = 0
        for c in s:
            h = (h * B + ord(c)) % P
        return h

    def word_shingles(t, w=2):
        toks = [x for x in re.split(r"[ \t\n\r\x0b\x0c]+", t) if x]
        hs = [poly(x[:64]) for x in toks]
        out = []
        for i in range(len(hs) - w + 1):
            h = hs[i]
            for j in range(1, w):
                h = (h * B + hs[i + j]) % P
            out.append(h)
        return out

    def whole(t):
        return poly(t[:256]) or 1

    def ref_minhash(hs, n_h, sa, sb, t):
        A = [v % (P - 1) + 1 for v in _splitmix64(n_h, sa)]
        Bc = [v % P for v in _splitmix64(n_h, sb)]
        if not hs:
            hs = [whole(t)]
        return [min((a * h + b) % P for h in hs) for a, b in zip(A, Bc)]

    texts = [
        "the quick brown fox jumps", "the quick brown fox jumped",
        "单一的中文文本没有空格分词测试", "", "ab", "x " * 40, "word",
        "tabs\tand\nnewlines here ok", "longword" * 20,
    ]
    ws, cs = _batch_minhash_features(texts, 2, 5, 24, 32)
    for d, t in enumerate(texts):
        grams = [poly(t[j:j + 5]) for j in range(len(t) - 4)]
        assert list(ws[d]) == ref_minhash(word_shingles(t), 24, 1, 2, t), d
        assert list(cs[d]) == ref_minhash(grams, 32, 11, 12, t), d


def test_minhash_signature_kernel_equals_column_math(spark):
    from fundcrawler_spark.operators.textstats import (
        minhash_signature,
        minhash_signature_kernel,
    )

    rows = [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, "abcd"),
            (5, "汉字测试文本"), (6, "x y z " * 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col = {r["doc_id"]: list(r["sig"]) for r in
           df.select("doc_id", minhash_signature(F.col("text"), 16).alias("sig")).collect()}
    ker = {r["doc_id"]: list(r["sig"])
           for r in minhash_signature_kernel(df, 16).collect()}
    assert col == ker

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    c2 = {r["doc_id"]: list(r["sig"]) for r in
          docs.select("doc_id", minhash_signature(F.col("text"), 16).alias("sig")).collect()}
    k2 = {r["doc_id"]: list(r["sig"])
          for r in minhash_signature_kernel(docs, 16).collect()}
    assert c2 == k2


def test_batch_minhash_features_nul_in_text():
    """U+0000 is the kernel's batch-concat separator; a NUL inside a
    document must not shift doc boundaries (previously an executor-side
    shape mismatch). Semantics: NULs are stripped before shingling —
    candidate stage only, exact verify sees the original text."""
    from fundcrawler_spark.operators.dedup import _batch_minhash_features

    dirty = ["before\x00after words here", "\x00", "clean text stays put"]
    clean = [t.replace("\x00", "") for t in dirty]
    wd, cd = _batch_minhash_features(dirty, 2, 5, 24, 32)
    wc, cc = _batch_minhash_features(clean, 2, 5, 24, 32)
    assert (wd == wc).all() and (cd == cc).all()
    assert wd.shape == (3, 24) and cd.shape == (3, 32)


def test_cosine_scored_kernel_equals_hof_bitexact(spark):
    """The numpy verify kernel (cosine_scored, r5 verdict item 4) must
    be BIT-identical to the interpreted aggregate/zip_with Column path:
    np.cumsum's sequential prefix sums reproduce the HOF left fold's
    addition order exactly, so swapping the verify stage cannot move
    any oracle-checked sim double."""
    import numpy as np
    from pyspark.sql import functions as F

    from fundcrawler_spark.operators.similarity import cosine, cosine_scored

    rng = np.random.default_rng(11)
    rows = [
        (int(i), int(1000 + i),
         [float(x) for x in rng.normal(size=64)],
         [float(x) for x in rng.normal(size=64)])
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, va array<double>, vb array<double>"
    )
    hof = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in df.withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .select("id_a", "id_b", "sim").collect()
    }
    knl = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in cosine_scored(
            df, "va", "vb", [("id_a", "long"), ("id_b", "long")]
        ).collect()
    }
    assert set(hof) == set(knl)
    import struct
    for key in hof:
        assert struct.pack("<d", hof[key]) == struct.pack("<d", knl[key]), key


def test_resize_vectorized_equals_loop_reference():
    """The np.ix_ integral-image resize (multimodal._resize_rgb) must be
    BIT-identical to the original per-pixel loop (kept here as the
    independent reference, r5 verdict item 2): same csum operands, same
    (a-b-c+d)/area IEEE ops, so the frozen images_resize oracle cannot
    move."""
    import numpy as np

    from fundcrawler_spark.operators.multimodal import _resize_rgb

    def loop_reference(arr, w_out, h_out):
        h, w = arr.shape[:2]
        ys = (np.arange(h_out + 1) * h // h_out).astype(int)
        xs = (np.arange(w_out + 1) * w // w_out).astype(int)
        out = np.empty((h_out, w_out, 3))
        for c in range(3):
            csum = np.zeros((h + 1, w + 1))
            csum[1:, 1:] = arr[:, :, c].astype(np.float64).cumsum(0).cumsum(1)
            for i in range(h_out):
                y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
                for j in range(w_out):
                    x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
                    area = (y1 - y0) * (x1 - x0)
                    out[i, j, c] = (
                        csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0]
                    ) / area
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)

    rng = np.random.default_rng(5)
    cases = [
        (97, 131, 33, 25), (64, 64, 16, 16), (200, 50, 40, 10),
        (7, 300, 5, 214), (1, 500, 1, 100), (500, 1, 100, 1),
    ]
    for h, w, w_out, h_out in cases:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = _resize_rgb(arr, w_out, h_out)
        ref = loop_reference(arr, w_out, h_out)
        assert got.dtype == ref.dtype and got.shape == ref.shape
        assert np.array_equal(got, ref), (h, w, w_out, h_out)
