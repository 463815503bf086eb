"""Dedup + similarity operator tests: LSH pipeline equals exact pairs,
simhash blocking finds planted near-dups, phash image near-dup pairs,
LSH top-k internal consistency."""

import numpy as np
from pyspark.sql import functions as F

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.functions import imaging
from fundcrawler_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    phash_near_dups,
    simhash_pairs,
)
from fundcrawler_spark.operators.similarity import brute_force_topk, lsh_topk

SF = "/root/testdata/sf0.001"


def test_lsh_equals_exact_pairs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.85).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.85).collect()
    }
    assert lsh == exact
    assert len(exact) > 0, "sf0.001 documents should contain planted near-dups"


def test_df_pruned_jaccard_equals_exact(spark):
    """DF-pruned candidate generation (corpus-scale path) must still
    find every threshold-grade pair here: near-dups share rare grams,
    and the verify stage computes jaccard exactly on full gram sets."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    exact = {(r["id_a"], r["id_b"], r["jaccard"])
             for r in jaccard_pairs(docs, threshold=0.85).collect()}
    pruned = {(r["id_a"], r["id_b"], r["jaccard"])
              for r in jaccard_pairs(docs, threshold=0.85, max_df=n // 4).collect()}
    assert pruned == exact and len(exact) > 0


def test_exact_dedup_identity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = exact_dedup(docs)
    assert out.count() == docs.select("text").distinct().count()
    assert out.agg(F.sum("n_copies")).first()[0] == docs.count()


def test_simhash_pairs_find_planted_dups(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # planted near-dups (jaccard >= 0.85) should mostly be simhash-close
    planted = {tuple(sorted((r["id_a"], r["id_b"])))
               for r in jaccard_pairs(docs, threshold=0.9).collect()}
    found = {tuple(sorted((r["id_a"], r["id_b"])))
             for r in simhash_pairs(docs, max_hamming=6).collect()}
    if planted:
        hit = len(planted & found) / len(planted)
        assert hit >= 0.5, (hit, len(planted), len(found))


def test_phash_near_dups(spark):
    rows = fx.image_rows(24)
    # plant a near-duplicate: re-encode row 0's image lossily under a new id
    arr = imaging.decode_image(bytes(rows[0][1]), rows[0][4])
    lossy = imaging.decode_image(imaging.encode_image(arr, "dctq"), "dctq")
    dup = ("img_dup_0", None, None, None, None, None, imaging.phash64(lossy))
    df = spark.createDataFrame(
        [(r[0], r[6]) for r in rows] + [(dup[0], dup[6])],
        "image_id string, phash long",
    ).dropDuplicates(["image_id"])
    pairs = {(r["id_a"], r["id_b"]) for r in phash_near_dups(df, max_hamming=6).collect()}
    assert any(rows[0][0] in p and "img_dup_0" in p for p in pairs), pairs


def test_multi_table_lsh_recall_on_perturbed_dups(spark):
    """Near-but-NOT-identical planted dups (cosine ~0.97-0.99) must all
    be found: this is the case a single AND-composed LSH bucket misses
    ~half the time — the OR-composed multi-table candidates + exact
    verify must have recall 1.0 on them."""
    from fundcrawler_spark.operators.similarity import cosine_near_dup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    rng = np.random.default_rng(7)
    base = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows]
    planted = []
    for vid, vec in base[::5]:  # every 5th vector gets a perturbed twin
        v = np.array(vec)
        w = v + rng.normal(0, 0.02, size=len(v))  # cosine ~0.97-0.99
        sim = float(np.dot(v, w) / (np.linalg.norm(v) * np.linalg.norm(w)))
        assert sim >= 0.95, sim
        planted.append((vid + 10000, [float(x) for x in w]))
    df = spark.createDataFrame(base + planted, "vec_id long, embedding array<double>")
    found = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(df, threshold=0.95).collect()
    }
    expect = {(vid, vid + 10000) for vid, _ in base[::5]}
    assert expect <= found, f"missed {sorted(expect - found)[:5]} of {len(expect)}"
    # precision: every reported pair really is above threshold
    V = dict(base + planted)
    for a, b in found:
        va, vb = np.array(V[a]), np.array(V[b])
        assert np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb)) >= 0.95


def test_lsh_topk_consistency(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=3).collect()
    # ranks are 1..k without gaps per query, neighbors never the query
    by_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_brute_force_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    got = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    q = V[0] / np.linalg.norm(V[0])
    sims = sorted(
        ((float(np.dot(q, v / np.linalg.norm(v))), i) for i, v in V.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )
    expect = [i for _, i in sims[:3]]
    assert [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])] == expect


def test_neardup_groups_equal_union_find(spark):
    """Connected components via min-label propagation must equal a
    driver-side union-find over the exact pair set."""
    from fundcrawler_spark.operators.dedup import neardup_groups

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = [(r["id_a"], r["id_b"])
             for r in jaccard_pairs(docs, threshold=0.85).collect()]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in ids}
    got = {r["doc_id"]: r["group_id"] for r in neardup_groups(docs).collect()}
    assert got == expect
    assert any(v != k for k, v in got.items())  # planted dups group up


def test_ivf_topk_recall_vs_brute_force(spark):
    from fundcrawler_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in brute_force_topk(emb, q, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    out = ivf_topk(emb, q, k=5, n_centroids=8, n_probe=4).collect()
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[qi] & approx.get(qi, set())) for qi in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, (hits, total, approx)
    # ranks contiguous per query
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
