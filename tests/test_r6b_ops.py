"""Round-6 late additions: PMI collocations."""

import os
import tempfile

from fundcrawler_spark.entry_queries import QUERIES


def test_pmi_collocations_hand_case(spark):
    """Fixed-point PMI == hand-computed n_xy*Nu^2*10000 // (n_x*n_y*Nb);
    a bigram that always co-occurs scores above independent pairs."""
    docs = [
        (1, "hong kong hong kong"),
        (2, "the cat the dog the cow"),
        (3, "hong kong the cat"),
    ]
    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(docs, "doc_id long, text string")
        df.write.parquet(os.path.join(d, "documents.parquet"))
        fn, _ = QUERIES["pmi_collocations"]
        got = {r["bigram"]: r for r in fn(spark, d).collect()}

    # hand counts: unigrams over all 12 tokens
    toks = " ".join(t for _, t in docs).split()
    nu = len(toks)
    ucnt = {t: toks.count(t) for t in set(toks)}
    bigrams = []
    for _, t in docs:
        ws = t.split()
        bigrams += [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
    nb = len(bigrams)
    for bg, row in got.items():
        x, y = bg.split(" ")
        n_xy = bigrams.count(bg)
        want = (n_xy * nu * nu * 10_000) // (ucnt[x] * ucnt[y] * nb)
        assert (row["n_xy"], row["n_x"], row["n_y"], row["pmi_scaled"]) == (
            n_xy, ucnt[x], ucnt[y], want), bg
    # "hong kong" (always adjacent) must outrank "the cat" (sometimes)
    assert got["hong kong"]["pmi_scaled"] > got["the cat"]["pmi_scaled"]
