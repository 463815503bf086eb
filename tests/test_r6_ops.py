"""Round-6 operators: as-of join, boilerplate/contamination n-grams,
PII redaction, image blur + quality filter."""

from pyspark.sql import functions as F

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.functions import imaging
from fundcrawler_spark.operators.asof import asof_enrich
from fundcrawler_spark.operators.multimodal import blur_scores
from fundcrawler_spark.operators.textstats import word_ngrams


# ------------------------------------------------------------- as-of


def test_asof_matches_naive_range_join(spark):
    """Union+window as-of == the naive inequality join + argmax, on a
    hand-built stream with every tie case: view at exactly the click
    ts (inclusive), two views at the same ts, clicks with no prior
    view (dropped), interleaved users."""
    rows = [
        # (event_id, ts, user_id, kind)
        (1, 100, 1, "view"),
        (2, 200, 1, "click"),   # matches view@100, n_prior=1
        (3, 200, 1, "view"),    # same ts as click 2? sorts before any LATER click
        (4, 200, 1, "click"),   # ts == view 3 -> inclusive, n_prior=2
        (5, 50, 2, "click"),    # no prior view -> dropped
        (6, 300, 2, "view"),
        (7, 300, 2, "view"),    # duplicate-ts views
        (8, 400, 2, "click"),   # n_prior=2, asof_ts=300
        (9, 500, 3, "view"),    # user with views only -> no output row
    ]
    from datetime import datetime, timezone

    df = spark.createDataFrame(
        [
            (e, datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None), u, k)
            for e, t, u, k in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    clicks = df.filter(F.col("event_type") == "click")
    views = df.filter(F.col("event_type") == "view")
    got = {
        r["left_id"]: (r["asof_ts"].timestamp(), r["n_prior"])
        for r in asof_enrich(
            clicks, views, key="user_id", ts="ts", right_id="event_id"
        ).collect()
    }
    # naive reference: for each click, views with same user and ts <= click ts
    expected = {}
    for e, t, u, k in rows:
        if k != "click":
            continue
        prior = [(tv, ev) for ev, tv, uv, kv in rows
                 if kv == "view" and uv == u and tv <= t]
        if prior:
            expected[e] = (float(max(tv for tv, _ in prior)), len(prior))
    assert got == expected


def test_asof_events_parquet_matches_pandas(spark):
    """Full-table cross-check on the shared events parquet."""
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = e.filter(F.col("event_type") == "click")
    views = e.filter(F.col("event_type") == "view")
    got = (
        asof_enrich(clicks, views, key="user_id", ts="ts", right_id="event_id")
        .toPandas()
        .set_index("left_id")
        .sort_index()
    )
    pdf = e.toPandas()
    c = pdf[pdf.event_type == "click"]
    v = pdf[pdf.event_type == "view"]
    exp_rows = {}
    for _, row in c.iterrows():
        prior = v[(v.user_id == row.user_id) & (v.ts <= row.ts)]
        if len(prior):
            exp_rows[row.event_id] = (prior.ts.max(), len(prior))
    assert len(got) == len(exp_rows)
    for eid, (ts_max, n) in exp_rows.items():
        assert got.loc[eid, "asof_ts"] == ts_max
        assert got.loc[eid, "n_prior"] == n


def test_asof_plan_has_no_join_and_one_exchange(spark):
    """The whole point of the union+window shape: zero join operators,
    exactly one hash exchange (on the key)."""
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = asof_enrich(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "view"),
        key="user_id",
        ts="ts",
        right_id="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ----------------------------------------------------------- n-grams


def test_word_ngrams_short_docs_yield_empty(spark):
    """Docs with fewer than n words must yield [] — F.sequence would
    otherwise generate a DESCENDING range and fabricate grams."""
    df = spark.createDataFrame(
        [("", ), ("one", ), ("one two", ), ("one two three", ),
         ("  ", ), ("a  b", )],  # double space -> empty token dropped
        "text string",
    )
    got = [r[0] for r in df.select(word_ngrams(F.col("text"), n=3)).collect()]
    assert got == [[], [], [], ["one two three"], [], []]


def test_word_ngrams_overlapping(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(word_ngrams(F.col("text"), n=2)).collect()[0][0]
    assert got == ["a b", "b c", "c d"]


# --------------------------------------------------------------- PII


def test_pii_rows_deterministic_and_planted():
    a, b = fx.pii_rows(60), fx.pii_rows(60)
    assert a == b
    # every 5th row (i % 5 == 4) has no email; i % 4 == 3 has no phone
    assert "@" not in a[4][1] and "@" not in a[9][1]
    assert "555-" not in a[3][1] and "555-" not in a[7][1]
    assert "@" in a[0][1] and "555-" in a[0][1] and "10." in a[0][1]


def test_pii_redact_scrubs_everything(spark):
    from fundcrawler_spark.entry_queries import QUERIES

    out = QUERIES["pii_redact"][0](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 120
    assert out.n_emails.sum() > 100 and out.n_phones.sum() > 80
    assert out.n_ips.sum() > 30
    # nothing PII-shaped survives redaction
    assert not out.redacted.str.contains("@").any()
    assert not out.redacted.str.contains(r"\d{3}-\d{3}-\d{4}", regex=True).any()
    assert not out.redacted.str.contains(
        r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", regex=True
    ).any()


# -------------------------------------------------------------- blur


def test_blur_scores_match_frozen(spark):
    from fundcrawler_spark.frozen_blur import FROZEN_BLUR_META

    rows = fx.image_rows(64)
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "image_id string, bytes binary"
    )
    got = {r["image_id"]: r["blur_var"] for r in blur_scores(df).collect()}
    for iid, _w, _h, bv in FROZEN_BLUR_META:
        assert got[iid] == bv, (iid, got[iid], bv)


def test_blur_var_degenerate_images():
    import numpy as np

    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    assert imaging.laplacian_blur_var(flat) == 0.0
    tiny = np.zeros((2, 2, 3), dtype=np.uint8)
    assert imaging.laplacian_blur_var(tiny) == 0.0
    # blur (box-mean) must strictly reduce the score of a sharp image
    sharp = fx.make_image("blur_probe", 48, 48)
    blurred = sharp.astype(np.int64)
    blurred = (
        blurred
        + np.roll(blurred, 1, 0) + np.roll(blurred, -1, 0)
        + np.roll(blurred, 1, 1) + np.roll(blurred, -1, 1)
    ) // 5
    assert imaging.laplacian_blur_var(blurred.astype(np.uint8)) < (
        imaging.laplacian_blur_var(sharp)
    )


def test_blur_none_payload_yields_null(spark):
    df = spark.createDataFrame(
        [("x", None), ("bad", bytearray(b"notanimage"))],
        "image_id string, bytes binary",
    )
    got = {r["image_id"]: r["blur_var"] for r in blur_scores(df).collect()}
    assert got == {"x": None, "bad": None}


# ----------------------------------------------------- quality filter


def test_images_quality_filter_subset(spark):
    from fundcrawler_spark.entry_queries import QUERIES

    out = QUERIES["images_quality_filter"][0](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert len(out) > 0
    # recompute the rule from the fixture metadata
    expected = set()
    for i, r in enumerate(fx.image_rows(64)):
        iid, w, h, fmt = r[0], r[2], r[3], r[4]
        if min(w, h) >= 48 and max(w, h) / min(w, h) <= 1.5 and fmt != "dctq":
            expected.add(iid)
    assert set(out.image_id) == expected
    assert (out.megapixels == out.w * out.h / 1e6).all()


# -------------------------------------------------- contamination plan


def test_contamination_broadcasts_benchmark_side(spark):
    from fundcrawler_spark.entry_queries import QUERIES

    df = QUERIES["contamination_check"][0](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    out = df.toPandas()
    # the sf0.001 slice may or may not contain planted near-dups that
    # cross the benchmark split; counts must at least be well-formed
    assert (out.n_shared_ngrams > 0).all() if len(out) else True


# ------------------------------------------- corpus n-grams / sampling


def test_corpus_ngram_topk_is_take_ordered(spark):
    """The global top-K must compile to TakeOrderedAndProject
    (per-partition heaps + driver merge of K rows), never a full sort
    of the gram table."""
    from fundcrawler_spark.entry_queries import QUERIES

    df = QUERIES["corpus_ngram_stats"][0](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    out = df.toPandas()
    assert len(out) == 50
    assert (out.n_total.values[:-1] >= out.n_total.values[1:]).all()
    assert (out.n_docs <= out.n_total).all()


def test_stratified_sample_deterministic_and_per_lang(spark):
    from fundcrawler_spark.entry_queries import QUERIES

    fn = QUERIES["stratified_sample"][0]
    a = fn(spark, "/root/testdata/sf0.001").toPandas().sort_values("doc_id")
    b = fn(spark, "/root/testdata/sf0.001").toPandas().sort_values("doc_id")
    assert a.doc_id.tolist() == b.doc_id.tolist()  # reproducible keep set
    assert (a.bucket < 1000).all() and (a.bucket >= 0).all()
    # zh keeps at ~80%, en at ~40%: the per-lang rates must actually bite
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").toPandas()
    for lang, rate in (("zh", 0.8), ("en", 0.4)):
        n_all = (src.lang == lang).sum()
        n_kept = (a.lang == lang).sum()
        if n_all >= 10:
            assert abs(n_kept / n_all - rate) < 0.35, (lang, n_kept, n_all)


# ------------------------------------------------- corpus LM score


def _py_lm_scores(texts: dict[str, str], scale: int = 10_000):
    """Independent pure-Python recompute of lm_quality_scores."""
    from collections import Counter

    bigrams = {k: [t[i : i + 2] for i in range(len(t) - 1)]
               for k, t in texts.items() if len(t) >= 2}
    cnt = Counter(b for bs in bigrams.values() for b in bs)
    pref = Counter()
    for bg, c in cnt.items():
        pref[bg[0]] += c
    q = {bg: (c * scale) // pref[bg[0]] for bg, c in cnt.items()}
    out = {}
    for k, bs in bigrams.items():
        s = sum(q[b] for b in bs)
        out[k] = (len(bs), s, float(s) / len(bs))
    return out


def test_lm_quality_matches_python_recompute(spark):
    """Exact (bit-level, incl. the float division) agreement with an
    independent reimplementation; len<2 docs are excluded."""
    from fundcrawler_spark.operators.textstats import lm_quality_scores

    texts = {
        "d1": "abab",
        "d2": "abba",
        "d3": "x",            # too short -> no output row
        "d4": "the fast key",  # realistic spacing
        "d5": "the the the",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_q"], r["lm_score"])
        for r in lm_quality_scores(df).collect()
    }
    assert got == _py_lm_scores(texts)
    assert "d3" not in got


def test_lm_quality_repetition_scores_higher(spark):
    """A doc made of the corpus's dominant bigrams outscores a doc of
    rare SUCCESSORS for the same prefix chars — the conditional-
    probability signal a perplexity filter keys on. (The rare doc must
    share prefixes with the common ones: a bigram whose prefix char it
    monopolizes gets conditional probability 1.0, not a low score.)"""
    from fundcrawler_spark.operators.textstats import lm_quality_scores

    rows = [("common%d" % i, "ababababab") for i in range(8)]
    rows.append(("rare", "aabb"))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    scores = {r["doc_id"]: r["lm_score"] for r in lm_quality_scores(df).collect()}
    assert scores["common0"] > scores["rare"]


def test_lm_quality_per_doc_join_is_broadcast(spark):
    from fundcrawler_spark.operators.textstats import lm_quality_scores

    df = spark.createDataFrame(
        [("d%d" % i, "spark window merge sort") for i in range(20)],
        "doc_id string, text string",
    )
    plan = lm_quality_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------- HTML extraction


def test_html_rows_deterministic():
    assert fx.html_rows(8) == fx.html_rows(8)
    assert len(fx.html_rows(8)) == 8


def test_html_extract_strips_blocks_tags_and_decodes(spark):
    from fundcrawler_spark.entry_queries import QUERIES

    fn, _ = QUERIES["html_text_extract"]
    rows = {r["page_id"]: r for r in fn(spark, "unused").collect()}
    assert len(rows) == 96
    r1 = rows["page_0001"]
    t = r1["extracted"]
    # script/style/comment CONTENT is gone (multi-line blocks incl.)
    assert "var a" not in t and "color:#f00" not in t
    assert "generated row" not in t and "second comment" not in t
    # no markup tags survive; decoded entities DO appear as text
    assert "<h1" not in t and "</p>" not in t and "<div>" not in t
    assert 'Fund "0001"' in t
    assert "manager's tenure 1 years" in t
    assert "<nav> value" in t  # &lt;nav&gt; is CONTENT, not markup
    # whitespace fully collapsed
    assert "  " not in t and "\t" not in t and "\n" not in t
    assert not t.startswith(" ") and not t.endswith(" ")
    # double-encoded row decodes exactly ONE level
    t0 = rows["page_0000"]["extracted"]
    assert "&lt;still-encoded&gt;" in t0
    # derived counts agree with the extracted string
    assert r1["n_chars"] == len(t)
    assert r1["n_words"] == len([w for w in t.split(" ") if w])


# ------------------------------------------- Gopher repetition


def _py_repetition(texts: dict):
    """Independent pure-Python recompute of repetition_signals."""
    from collections import Counter

    out = {}
    for k, t in texts.items():
        words = [w for w in t.split(" ") if w]
        n_chars = len(t)
        g2 = Counter(
            " ".join(words[i : i + 2]) for i in range(len(words) - 1)
        )
        g5 = Counter(
            " ".join(words[i : i + 5]) for i in range(len(words) - 4)
        )
        top2 = max((c * len(g) for g, c in g2.items()), default=0)
        dup5 = sum(c * len(g) for g, c in g5.items() if c >= 2)
        d = max(n_chars, 1)
        out[k] = (
            n_chars, len(words), top2, dup5,
            float(top2) / d, float(dup5) / d,
        )
    return out


def test_repetition_signals_match_python_recompute(spark):
    from fundcrawler_spark.operators.textstats import repetition_signals

    texts = {
        "rep": "go go go go go stop",              # one dominant 2-gram
        "dup5": "a b c d e x a b c d e y a b c d e",  # repeated 5-gram
        "clean": "the quick brown fox jumps over a lazy dog",
        "one": "word",                              # no 2-grams at all
        "empty": "",                                # zero chars
        "spaces": "  padded   words  here  ",       # empties dropped
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_chars"], r["n_words"], r["top2_chars"], r["dup5_chars"],
            r["top_2gram_char_frac"], r["dup_5gram_char_frac"],
        )
        for r in repetition_signals(df).collect()
    }
    assert got == _py_repetition(texts)
    # the signal separates: repeated doc far above clean prose
    assert got["rep"][4] > 0.5 > got["clean"][4]
    assert got["dup5"][5] > 0.5 > got["clean"][5]
    # every doc keeps a row (left joins), zeros not nulls
    assert got["one"] == (4, 1, 0, 0, 0.0, 0.0)
    assert got["empty"] == (0, 0, 0, 0, 0.0, 0.0)


# ------------------------------------------------------------- dhash


def test_dhash_frozen_matches_live_kernel():
    """Reproduction pin: the pure-Python frozen values == the live
    numpy dhash64 on every fixture image (incl. the planted lossy
    re-encodes) — a semantic drift in either side breaks this."""
    from fundcrawler_spark.frozen_dhash import FROZEN_DHASH_META

    rows = {r[0]: r for r in fx.image_rows(64)}
    assert len(FROZEN_DHASH_META) == 72
    for iid, dh in FROZEN_DHASH_META:
        if iid.startswith("dup_"):
            r = rows[iid[4:]]
            arr = imaging.decode_image(bytes(r[1]), r[4])
            arr = imaging.decode_image(
                bytes(imaging.encode_image(arr, "dctq")), "dctq"
            )
        else:
            r = rows[iid]
            arr = imaging.decode_image(bytes(r[1]), r[4])
        assert imaging.dhash64(arr) == dh, iid


def test_dhash_degenerate_and_invariances():
    import numpy as np

    # below the 9x8 grid -> None, not a bogus hash
    assert imaging.dhash64(np.zeros((7, 9, 3), dtype=np.uint8)) is None
    assert imaging.dhash64(np.zeros((8, 8, 3), dtype=np.uint8)) is None
    # flat image -> all comparisons false -> hash 0
    flat = np.full((16, 18, 3), 123, dtype=np.uint8)
    assert imaging.dhash64(flat) == 0
    # monotone left->right gradient -> every bit 0; reversed -> every bit 1
    ramp = np.tile(
        np.linspace(0, 255, 36, dtype=np.uint8)[None, :, None], (16, 1, 3)
    )
    assert imaging.dhash64(ramp) == 0
    rev = ramp[:, ::-1, :].copy()
    assert imaging.dhash64(rev) == -1  # 64 ones = signed -1
    # brightness shift leaves the gradient signs (hence the hash) alone
    img = fx.make_image("dhash_probe", 48, 48)
    shifted = np.clip(img.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    dh_img = imaging.dhash64(img)
    assert (
        bin((dh_img ^ imaging.dhash64(shifted)) & (2**64 - 1)).count("1") <= 6
    )


def test_consensus_rejects_phash_false_positive(spark):
    """At the fixture thresholds phash alone admits 9 pairs; the dhash
    post-filter drops exactly the one non-planted collision."""
    from fundcrawler_spark.entry_queries import QUERIES, _dhash_fixture_df
    from fundcrawler_spark.operators.dedup import phash_near_dups
    from fundcrawler_spark.operators.multimodal import (
        dhash_images,
        enrich_images,
    )

    df = _dhash_fixture_df(spark)
    ph = enrich_images(df).select("image_id", "phash")
    phash_only = phash_near_dups(ph, max_hamming=12).collect()
    assert len(phash_only) == 9
    out = QUERIES["consensus_near_dup_pairs"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 8
    # the 8 survivors are exactly the planted re-encodes
    got_pairs = {tuple(sorted((r["id_a"], r["id_b"]))) for r in out}
    assert got_pairs == {
        tuple(sorted((f"img_{k}_0", f"dup_img_{k}_0")))
        for k in range(0, 16, 2)
    }


# ------------------------------------------- corpus composition


def test_corpus_composition_shares_sum_to_one(spark):
    from fundcrawler_spark.entry_queries import QUERIES

    out = QUERIES["corpus_composition"][0](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert abs(out.token_share.sum() - 1.0) < 1e-12
    # pandas recompute of one cell
    import pandas as pd
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    docs["n_tokens"] = docs.text.map(
        lambda t: len([w for w in t.split(" ") if w])
    )
    cell = docs[(docs.source == docs.source.iloc[0]) & (docs.lang == "en")]
    row = out[(out.source == docs.source.iloc[0]) & (out.lang == "en")]
    assert int(row.n_docs.iloc[0]) == len(cell)
    assert int(row.n_tokens.iloc[0]) == int(cell.n_tokens.sum())
    assert row.token_share.iloc[0] == cell.n_tokens.sum() / docs.n_tokens.sum()


def test_event_value_quantiles_hand_case(spark):
    """Exact percentile == linear interpolation at rank p*(n-1)."""
    from fundcrawler_spark.entry_queries import QUERIES
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        vals = [1.0, 2.0, 3.0, 4.0, 10.0]
        df = spark.createDataFrame(
            [(i, "a", v) for i, v in enumerate(vals)],
            "event_id long, event_type string, value double",
        )
        df.write.parquet(os.path.join(d, "events.parquet"))
        fn, _ = QUERIES["event_value_quantiles"]
        row = fn(spark, d).collect()[0]
        assert row["n"] == 5
        assert row["p50"] == 3.0                      # rank 2
        # rank 3.8 / 3.96 — tolerance because the interpolation's
        # float op ORDER is engine-internal; the oracle row proves
        # Spark == DuckDB bit-exactly, this proves the definition
        assert abs(row["p95"] - (4.0 + 0.8 * 6.0)) < 1e-12
        assert abs(row["p99"] - (4.0 + 0.96 * 6.0)) < 1e-12


# ------------------------------------------- incremental near-dup gate


def test_incremental_neardup_equals_cross_split_subset(spark):
    """Probing a batch against the corpus index finds EXACTLY the
    symmetric pair set's cross-split pairs — same families, same
    verify, no self-pairs, and the corpus-side pairs are untouched."""
    from fundcrawler_spark.operators.dedup import (
        incremental_neardup_pairs,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    inc = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental_neardup_pairs(corpus, batch, 0.85).collect()
    }
    sym = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, 0.85).collect()
    }
    expected = {}
    for (a, b), j in sym.items():
        if (a % 5 == 0) != (b % 5 == 0):
            new, old = (a, b) if a % 5 == 0 else (b, a)
            expected[(new, old)] = j
    assert inc == expected
    assert len(inc) > 0, "split should cross at least one planted pair"


# ----------------------------------------------- count-min sketch


def test_cms_bound_slack_and_mergeability(spark):
    """(a) estimate >= exact for EVERY distinct token; (b) at demo
    width 256 < vocab size the bound has genuine slack somewhere;
    (c) sketches merge by summing bucket counts: sketch(A)+sketch(B)
    == sketch(A union B) exactly."""
    from fundcrawler_spark.operators.sketch import cms_estimate, cms_sketch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1))),
        lambda g_i: F.substring(F.lower(F.col("text")), g_i, 3),
    )
    tok = docs.select("doc_id", F.explode(grams).alias("token")).cache()

    W = 256
    sketch = cms_sketch(tok, width=W).cache()
    exact = tok.groupBy("token").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(sketch, exact.select("token"), width=W)
    both = exact.join(est, "token").toPandas()
    assert (both.cms_n >= both.exact_n).all()
    assert (both.cms_n > both.exact_n).any(), (
        "width 256 < vocab must produce at least one collision overestimate"
    )

    # mergeability: split by doc, sum the two sketches, compare buckets
    sk_a = cms_sketch(tok.filter(F.col("doc_id") % 2 == 0), width=W)
    sk_b = cms_sketch(tok.filter(F.col("doc_id") % 2 != 0), width=W)
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("seed", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    full = {(r["seed"], r["bucket"]): r["c"] for r in sketch.collect()}
    summed = {(r["seed"], r["bucket"]): r["c"] for r in merged.collect()}
    assert summed == full


def test_hll_registers_estimate_and_merge(spark):
    """(a) the register-derived estimate lands within the standard
    ~1.04/sqrt(m) HLL error envelope of the exact distinct count per
    group (3 sigma); (b) merging split sketches by elementwise MAX
    reproduces the full sketch exactly."""
    from fundcrawler_spark.operators.sketch import (
        HLL_M,
        hll_estimate,
        hll_registers,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").cache()
    regs = hll_registers(ev, "user_id", ["event_type"]).cache()

    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    by_type: dict = {}
    for r in regs.collect():
        by_type.setdefault(r["event_type"], {})[r["bucket"]] = r["max_rho"]
    assert set(by_type) == set(exact)
    tol = 3 * 1.04 / (HLL_M ** 0.5)  # ~39% at m=64, 3 sigma
    for et, true_n in exact.items():
        est = hll_estimate(by_type[et])
        assert abs(est - true_n) / true_n < tol, (et, est, true_n)

    # mergeability: sketch(A) max-merged with sketch(B) == sketch(all)
    a = hll_registers(ev.filter(F.col("event_id") % 2 == 0), "user_id", ["event_type"])
    b = hll_registers(ev.filter(F.col("event_id") % 2 != 0), "user_id", ["event_type"])
    merged = (
        a.unionByName(b)
        .groupBy("event_type", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    full = {(r["event_type"], r["bucket"]): r["max_rho"] for r in regs.collect()}
    got = {(r["event_type"], r["bucket"]): r["max_rho"] for r in merged.collect()}
    assert got == full


# ------------------------------------------ bottom-k / KMV sample


def test_bottomk_sample_merge_law_and_kmv_estimate(spark):
    """(a) bottom-k(A union B) == bottom-k(bottom-k(A) union
    bottom-k(B)) — the KMV merge law that makes the sample a sketch;
    (b) the k-th smallest key estimates distinct count within the
    standard ~1/sqrt(k-1) envelope (3 sigma)."""
    from fundcrawler_spark.entry_queries import QUERIES
    from fundcrawler_spark.operators.sampling import lehmer2
    from fundcrawler_spark.operators.textstats import P31, horner_hash
    from fundcrawler_spark.operators.topk import grouped_topk

    fn, _ = QUERIES["bottomk_group_sample"]
    full = fn(spark, "/root/testdata/sf0.01").toPandas()

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    d = docs.select("doc_id", "lang").withColumn(
        "sample_key", lehmer2(horner_hash(F.col("doc_id").cast("string")))
    )

    def bottomk(df, k=20):
        return grouped_topk(
            df, ["lang"], [F.col("sample_key").asc()], k=k,
            tiebreak=["doc_id"],
        ).select("lang", "doc_id", "sample_key")

    a = bottomk(d.filter(F.col("doc_id") % 2 == 0))
    b = bottomk(d.filter(F.col("doc_id") % 2 != 0))
    merged = bottomk(a.unionByName(b).drop("rank")).toPandas()
    want = full[["lang", "doc_id", "sample_key"]]
    key = lambda df: sorted(map(tuple, df.to_numpy().tolist()))
    assert key(merged) == key(want)

    # KMV: n_hat = (k-1) * M / kth_key, M = hash range (P31-1 here)
    exact = docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n")).collect()
    exact = {r["lang"]: r["n"] for r in exact}
    k = 20
    for lang, grp in full.groupby("lang"):
        kth = grp["sample_key"].max()
        n_hat = (k - 1) * (P31 - 1) / kth
        sigma = 1.0 / (k - 1) ** 0.5
        assert abs(n_hat - exact[lang]) / exact[lang] < 3 * sigma, (
            lang, n_hat, exact[lang])


def test_event_gap_audit_hand_case(spark):
    """Gaps are per-actor consecutive diffs; ties on ts order by
    event_id; first event per actor contributes no gap; violations
    count gaps strictly under 1s."""
    from fundcrawler_spark.entry_queries import QUERIES
    import datetime as dt
    import os, tempfile

    base = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: gaps 0.5s (violation), 2s
        (1, base, 1, "a", 0.0, ""),
        (2, base + dt.timedelta(seconds=0.5), 1, "a", 0.0, ""),
        (3, base + dt.timedelta(seconds=2.5), 1, "a", 0.0, ""),
        # user 2: tie ts -> 0us gap (violation), then 1s exactly (NOT <1s)
        (4, base, 2, "b", 0.0, ""),
        (5, base, 2, "b", 0.0, ""),
        (6, base + dt.timedelta(seconds=1), 2, "b", 0.0, ""),
        # user 3: single event -> no gap rows
        (7, base, 3, "c", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        fn, _ = QUERIES["event_gap_audit"]
        got = {r["event_type"]: r for r in fn(spark, d).collect()}
    assert set(got) == {"a", "b"}
    assert (got["a"]["n_gaps"], got["a"]["min_gap_us"], got["a"]["n_violations"]) == (2, 500_000, 1)
    assert (got["b"]["n_gaps"], got["b"]["min_gap_us"], got["b"]["n_violations"]) == (2, 0, 1)


def test_cms_estimate_unseen_token_reads_zero(spark):
    # ADVICE r6: probing a token absent from the sketched stream must
    # return the true CMS estimate (min over its counters, possibly 0),
    # not silently vanish from the output
    from pyspark.sql import functions as F

    from fundcrawler_spark.operators.sketch import cms_estimate, cms_sketch

    W = 64
    stream = spark.createDataFrame(
        [("alpha",)] * 5 + [("beta",)] * 2, "token string"
    )
    sketch = cms_sketch(stream, width=W)
    probes = spark.createDataFrame(
        [("alpha",), ("never-seen-token-xyz",)], "token string"
    )
    est = {
        r["token"]: r["cms_n"]
        for r in cms_estimate(sketch, probes, width=W).collect()
    }
    assert est["alpha"] >= 5
    assert "never-seen-token-xyz" in est
    # with only 2 distinct sketched tokens in a 64-wide sketch, the
    # unseen token keeps at least one untouched (absent) counter
    assert est["never-seen-token-xyz"] == 0
