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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact cosine top-k.
    ``queries`` is broadcast (small side); per-query ranking uses the
    salted two-phase top-K so popular queries don't pin reducers."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    top = grouped_topk(
        scored,
        ["query_id"],
        [F.col("sim").desc()],
        k,
        tiebreak=["neighbor_id"],
    )
    return top.select("query_id", "neighbor_id", "rank")


def _lsh_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane sign bucket with deterministic pseudo-planes:
    plane p's weight for dim i = ((i+1)*(p*2+3)) % 7 - 3 — integer,
    engine-independent, good enough to split a corpus into 2^n_planes
    buckets."""
    def _weight(p: int):
        return lambda x, i: x * ((i.cast("long") * (2 * p + 3)) % 7 - 3).cast("double")

    out = F.lit(0)
    for p in range(n_planes):
        s = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(1), F.size(vec)), _weight(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (equi-join on bucket -> per-bucket scoring). At 100 TB this
    is the shape that matters: the shuffle key is the bucket id, and
    each task scores one bucket slice instead of the full corpus."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", _lsh_bucket(F.col("cv"), n_planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", _lsh_bucket(F.col("qv"), n_planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    top = grouped_topk(
        scored, ["query_id"], [F.col("sim").desc()], k, tiebreak=["neighbor_id"]
    )
    return top.select("query_id", "neighbor_id", "rank")


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold,
    LSH-bucketed to avoid the cross join (exact verify within bucket)."""
    v = embeddings.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", _lsh_bucket(F.col("v"), n_planes))
    a, b = v.alias("a"), v.alias("b")
    cand = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
    )
    return (
        cand.withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
