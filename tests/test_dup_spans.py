"""Duplicated-substring detection (dup_span_flags)."""

from fundcrawler_spark.operators.dedup import dup_span_flags


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in dup_span_flags(df, **kw).collect()}


def test_identical_docs_fully_flagged(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    unique = "completely different words live in this sentence about bonds"
    got = _run(spark, [(1, text), (2, text), (3, unique)], width=32, stride=8)
    assert got[1]["dup_flag"] and got[2]["dup_flag"]
    assert got[1]["n_dup_spans"] == got[1]["n_spans"] > 0
    assert not got[3]["dup_flag"] and got[3]["n_dup_spans"] == 0


def test_short_doc_has_zero_spans(spark):
    got = _run(spark, [(1, "tiny"), (2, "x" * 127)])
    assert got[1]["n_spans"] == 0 and not got[1]["dup_flag"]
    assert got[2]["n_spans"] == 0 and not got[2]["dup_flag"]


def test_within_doc_repetition_counts(spark):
    """doc = X+X with len(X) stride-aligned: the second copy's spans
    collide with the first copy's."""
    x = "abcdefgh" * 5  # 40 chars, multiple of stride 8
    got = _run(
        spark, [(1, x + x), (2, "z" * 39 + "q")], width=32, stride=8
    )
    assert got[1]["dup_flag"]
    assert got[1]["n_dup_spans"] > 0


def test_partial_overlap_flags_only_shared_region(spark):
    """Two docs sharing a long aligned prefix: flagged, but the doc
    with a unique tail keeps some unflagged spans."""
    shared = "shared prefix text that runs long enough to cover spans "
    a = shared + "tail one goes this way with extra unique words here"
    b = shared + "completely different ending material for the other doc"
    got = _run(spark, [(1, a), (2, b)], width=32, stride=8)
    assert got[1]["dup_flag"] and got[2]["dup_flag"]
    assert 0 < got[1]["n_dup_spans"] < got[1]["n_spans"]


def test_documents_table_discrimination(spark):
    """At the 128/32 defaults the op must separate signal from noise
    on the shared documents table: >=90% of the docs in the exact
    near-dup pair set are span-flagged, while the organic flag rate
    stays well below saturation (32-char windows flag 100% of this
    tiny-vocab corpus — the default width exists to avoid that)."""
    from fundcrawler_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = minhash_lsh_pairs(docs).collect()
    ids = sorted({r[0] for r in pairs} | {r[1] for r in pairs})
    assert len(ids) >= 40
    flags = {r["doc_id"]: r["dup_flag"] for r in dup_span_flags(docs).collect()}
    hit = sum(1 for i in ids if flags[i])
    assert hit >= 0.9 * len(ids)
    organic_rate = sum(flags.values()) / len(flags)
    assert organic_rate < 0.6


def test_fingerprint_dups_equal_true_string_dups(spark):
    """Horner fingerprints flag EXACTLY the spans whose 128-char string
    occurs >1 time corpus-wide at this scale (the linear poly_hash
    fingerprint flagged +76% false dups here — regression pin)."""
    import collections

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    flags = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in dup_span_flags(docs, width=128, stride=32).collect()
    }

    spans_by_doc: dict = {}
    counts: collections.Counter = collections.Counter()
    for r in docs.select("doc_id", "text").collect():
        t = r["text"] or ""
        spans = [t[p:p + 128] for p in range(0, max(len(t) - 127, 0), 32)]
        spans_by_doc[r["doc_id"]] = spans
        counts.update(spans)
    for doc_id, spans in spans_by_doc.items():
        n_dup = sum(1 for s in spans if counts[s] > 1)
        assert flags[doc_id] == (len(spans), n_dup), doc_id
