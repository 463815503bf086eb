"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — queries x corpus via broadcast of
the (small) query set, dot products in JVM higher-order functions
(zip_with + aggregate), salted top-K per query. The scale path is an
LSH-bucketed variant (random-hyperplane signs with deterministic
integer "planes") that only scores within-bucket candidates — the
IVF-style pattern: probe buckets, score locally, merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import grouped_topk

P31 = 2147483647


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_scored(pairs: DataFrame, a_col: str, b_col: str,
                  keep: list[tuple[str, str]]) -> DataFrame:
    """Score candidate pairs with a vectorized numpy kernel instead of
    interpreted ``aggregate``/``zip_with`` HOFs (r5 verdict item 4 —
    Spark HOFs are not codegen'd, and the verify stage dominates when
    candidate sets are large). BIT-IDENTICAL to the HOF path: the HOF
    computes a sequential left-fold sum (((0+p1)+p2)+...), and
    ``np.cumsum(...)[:, -1]`` produces the exact same addition order,
    so every sim double matches the Column expression bit for bit
    (pinned by tests/test_kernel_equivalence.py) and the DuckDB
    oracles stay green.

    ``keep``: (column, spark_type) id columns carried through;
    ``a_col``/``b_col``: array<double> vector columns (consumed)."""
    import numpy as np
    import pandas as pd

    schema = ", ".join(f"{c} {t}" for c, t in keep) + ", sim double"
    cols = [c for c, _ in keep]

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[a_col]])
            B = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[b_col]])
            d = np.cumsum(A * B, axis=1)[:, -1]
            na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
            nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
            out = {c: pdf[c].to_numpy() for c in cols}
            out["sim"] = d / (na * nb)
            yield pd.DataFrame(out)

    return pairs.select(*cols, a_col, b_col).mapInPandas(kernel, schema)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact cosine top-k.

    The query side is collected to the driver (it is the small side by
    contract — the prior shape broadcast it for a crossJoin, the same
    memory assumption) and closed over by a numpy kernel that streams
    the CORPUS once: each corpus batch crosses the Python boundary one
    time and is scored against all queries in-kernel, instead of
    materializing |Q| x |C| pair rows that each drag two vectors
    through Arrow (r7: ~1.7 s -> ~1.0 s at sf1.0, 20k x 10). Scores are
    bit-identical to the HOF cosine: per pair the same elementwise
    product and the same sequential left-fold order via cumsum
    (test_kernel_equivalence pins the fold; test_similarity pins this
    path against cosine_scored's), so the exact-oracle rows are
    unchanged. Per-query ranking stays the salted two-phase top-K so
    popular queries don't pin reducers.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    import numpy as np

    qrows = q.collect()
    Q = [(r["query_id"], np.asarray(r["qv"], dtype=np.float64)) for r in qrows]
    id_t = dict(corpus.dtypes)[id_col]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
            # same fold order as cosine_scored: cumsum over the feature
            # axis == the HOF's sequential left-fold
            nb = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
            nid = pdf["neighbor_id"].to_numpy()
            for qid, qv in Q:
                d = np.cumsum(qv[None, :] * A, axis=1)[:, -1]
                na = np.sqrt(np.cumsum(qv * qv)[-1])
                yield pd.DataFrame(
                    {"neighbor_id": nid, "query_id": qid, "sim": d / (na * nb)}
                )

    spark = corpus.sparkSession
    scored = (
        c.repartition(spark.sparkContext.defaultParallelism, "neighbor_id")
        .mapInPandas(kernel, f"neighbor_id {id_t}, query_id {id_t}, sim double")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("sim").desc()],
        k,
        tiebreak=["neighbor_id"],
    )
    return top.select("query_id", "neighbor_id", "rank")


def _plane_matrix(n_tables: int, n_planes: int, dim: int):
    """Deterministic random-sign (Rademacher) hyperplanes from a
    splitmix64 bit stream — (n_tables, n_planes, dim) of +/-1."""
    import numpy as np

    from .dedup import _splitmix64

    n_bits = n_tables * n_planes * dim
    words = _splitmix64((n_bits + 63) // 64, salt=7)
    bits = np.unpackbits(
        np.array(words, dtype=np.uint64).view(np.uint8), bitorder="little"
    )[:n_bits]
    return (bits.astype(np.float64) * 2.0 - 1.0).reshape(n_tables, n_planes, dim)


def lsh_bucket_matrix(V, n_planes: int, n_tables: int):
    """Pure-numpy bucket math shared by the Spark kernel and the
    frozen-oracle freeze script (scripts/freeze_ann.py): V (n, dim)
    float64 -> (n, n_tables) int64 bucket ids, one per plane table."""
    import numpy as np

    p2 = (1 << np.arange(n_planes, dtype=np.int64))
    H = _plane_matrix(n_tables, n_planes, V.shape[1])  # (T, P, dim)
    # signs: (T, P, n) -> bucket per table: (n, T)
    proj = np.einsum("tpd,nd->tpn", H, V)
    return ((proj > 0).astype(np.int64) * p2[None, :, None]).sum(axis=1).T


def _lsh_buckets(
    df: DataFrame, id_col: str, out_id: str, vec_col: str,
    n_planes: int, n_tables: int,
) -> DataFrame:
    """(out_id, v array<double>, buckets array<long>[n_tables]) via a
    numpy mapInPandas kernel: one matmul against the sign-plane tensor
    per batch. One bucket per table — tables are OR-composed downstream
    (union of per-table candidates), which is what keeps recall high at
    the threshold: P(hit) = 1-(1-(1-theta/pi)^planes)^tables, vs the
    coin-flip a single AND-only signature gives near the threshold."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            buckets = lsh_bucket_matrix(V, n_planes, n_tables)
            yield pd.DataFrame({
                out_id: pdf[id_col].to_numpy(),
                "v": list(V),
                "buckets": list(buckets),
            })

    spark = df.sparkSession
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .repartition(spark.sparkContext.defaultParallelism, F.col(id_col))
        .mapInPandas(kernel, f"{out_id} long, v array<double>, buckets array<long>")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing a bucket
    with the query in AT LEAST ONE of ``n_tables`` independent plane
    tables (multi-table OR composition). At 100 TB this is the shape
    that matters: the shuffle key is (table, bucket), each task scores
    one bucket slice, and recall at cosine ~0.95 is
    1-(1-0.43)^12 > 0.999 instead of the ~0.5 a single table gives."""
    c = _lsh_buckets(corpus, id_col, "neighbor_id", vec_col, n_planes, n_tables)
    q = _lsh_buckets(queries, id_col, "query_id", vec_col, n_planes, n_tables)
    ce = c.select("neighbor_id", "v", F.posexplode("buckets").alias("tbl", "bucket"))
    qe = q.select(
        F.col("query_id"), F.col("v").alias("qv"),
        F.posexplode("buckets").alias("tbl", "bucket"),
    )
    # candidates dedup on skinny ids, vectors re-attached afterwards
    cand = (
        ce.select("neighbor_id", "tbl", "bucket")
        .join(F.broadcast(qe.select("query_id", "tbl", "bucket")), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    pairs = (
        cand.join(c.select("neighbor_id", "v"), "neighbor_id")
        .join(F.broadcast(q.select("query_id", F.col("v").alias("qv"))), "query_id")
    )
    scored = cosine_scored(
        pairs, "qv", "v", [("query_id", "long"), ("neighbor_id", "long")]
    )
    top = grouped_topk(
        scored, ["query_id"], [F.col("sim").desc()], k, tiebreak=["neighbor_id"]
    )
    return top.select("query_id", "neighbor_id", "rank")


def ivf_codebook(X, n_centroids: int, iters: int):
    """Pure-numpy Lloyd k-means (cosine/spherical) over the sample
    matrix — shared by the Spark path and scripts/freeze_ann.py."""
    import numpy as np

    from .dedup import _splitmix64

    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    # splitmix64-spread initial picks over the sample (deterministic)
    idx = sorted({v % len(X) for v in _splitmix64(4 * n_centroids, salt=3)})[:n_centroids]
    C = X[np.array(idx)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_cell_matrix(V, C, n: int):
    """Pure-numpy nearest-cell assignment: V (rows, dim) float64 ->
    (rows, n) int32 cell ids by cosine against codebook C."""
    import numpy as np

    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    sims = Vn @ C.T
    return np.argsort(-sims, axis=1, kind="stable")[:, :n].astype(np.int32)


def _ivf_centroids(corpus: DataFrame, vec_col: str, n_centroids: int,
                   sample: int, iters: int, id_col: str):
    """Deterministic coarse quantizer: Lloyd k-means (cosine/spherical)
    on an id-ordered sample, driver-side numpy. The sample bounds the
    driver work — at 100 TB the codebook still trains on a few thousand
    rows while assignment stays fully distributed."""
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return ivf_codebook(X, n_centroids, iters)


def _assign_cells(df: DataFrame, id_col: str, out_id: str, vec_col: str,
                  C, n_probe: int) -> DataFrame:
    """(out_id, v, cells array<int>[n_probe]): nearest-centroid cells by
    cosine, one numpy matmul per Arrow batch."""
    import numpy as np
    import pandas as pd

    Cb = C  # closed over; small (n_centroids x dim)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cells = ivf_cell_matrix(V, Cb, n_probe)
            yield pd.DataFrame({out_id: pdf[id_col].to_numpy(),
                                "v": list(V), "cells": list(cells)})

    spark = df.sparkSession
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .repartition(spark.sparkContext.defaultParallelism, F.col(id_col))
        .mapInPandas(kernel, f"{out_id} long, v array<double>, cells array<int>")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    corpus_assign: int = 3,
    sample: int = 512,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors live in the cells of
    their ``corpus_assign`` nearest centroids (multi-assignment inverted
    file); each query scores only the cells of its ``n_probe`` nearest
    centroids. The scale shape: shuffle key = cell id, each task scans
    one posting list — recall/cost tuned by (n_centroids, n_probe,
    corpus_assign) instead of the corpus size; index size scales by
    corpus_assign, query work by n_probe.

    Measured on the testdata embeddings (unit-norm noise, deliberately
    IVF-adversarial: top-5 neighbors sit at cosine ~0.4-0.5, i.e. near
    cell boundaries, and there is no cluster structure for the coarse
    quantizer to exploit): 16 centroids, recall@5 vs brute force at
    corpus_assign=1 rises 0.32/0.44/0.64/0.88 over n_probe=1/2/4/8,
    and the default (corpus_assign=3, n_probe=4) reaches ~0.96 at a
    candidate fraction of ~corpus_assign*n_probe/n_centroids. On
    clustered production embeddings the same knobs hit the recall bar
    at a far smaller fraction (n_centroids ~ sqrt(n), neighbors share
    the query's cell); the curve test pins the monotonicity contract
    rather than one corpus's absolute numbers."""
    C = _ivf_centroids(corpus, vec_col, n_centroids, sample, iters, id_col)
    c = _assign_cells(corpus, id_col, "neighbor_id", vec_col, C, corpus_assign)
    q = _assign_cells(queries, id_col, "query_id", vec_col, C, n_probe)
    ce = c.select("neighbor_id", "v", F.explode("cells").alias("cell"))
    qe = q.select("query_id", F.col("v").alias("qv"), F.explode("cells").alias("cell"))
    pairs = (
        ce.join(F.broadcast(qe), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cosine_scored(
        pairs, "qv", "v", [("query_id", "long"), ("neighbor_id", "long")]
    )
    top = grouped_topk(
        scored, ["query_id"], [F.col("sim").desc()], k, tiebreak=["neighbor_id"]
    )
    return top.select("query_id", "neighbor_id", "rank")


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold:
    multi-table LSH candidates (union over ``n_tables`` independent
    sign-plane tables), then exact cosine verification. The exact
    verify keeps precision at 1; the OR-composed tables keep recall at
    threshold-grade pairs >0.999 (a single 6-plane AND bucket missed
    ~half of true pairs at cosine 0.95)."""
    b = _lsh_buckets(embeddings, id_col, "id", vec_col, n_planes, n_tables).persist()
    e = b.select("id", F.posexplode("buckets").alias("tbl", "bucket"))
    cand = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = (
        cand.join(b.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(b.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
    )
    scored = cosine_scored(
        pairs, "va", "vb", [("id_a", "long"), ("id_b", "long")]
    )
    return scored.filter(F.col("sim") >= threshold).select("id_a", "id_b", "sim")
