"""Aspect-ratio bucketed batch composition (operators/packing.py)."""

from collections import defaultdict

from fundcrawler_spark.operators.packing import (
    ASPECT_BUCKETS,
    aspect_bucket_batches,
    aspect_bucket_case_sql,
)


def _assign(spark, dims):
    df = spark.createDataFrame(
        [(f"img_{i:03d}", w, h) for i, (w, h) in enumerate(dims)],
        "image_id string, w int, h int",
    )
    return aspect_bucket_batches(df, batch_size=4, n_shards=4)


def test_bucket_assignment_hand_cases(spark):
    dims = [(100, 100), (400, 300), (300, 400), (1600, 900), (900, 1600),
            (1500, 1000), (1000, 1500)]
    got = {r["image_id"]: r["bucket"] for r in _assign(spark, dims).collect()}
    expect = ["1:1", "4:3", "3:4", "16:9", "9:16", "3:2", "2:3"]
    for i, e in enumerate(expect):
        assert got[f"img_{i:03d}"] == e, (i, got[f"img_{i:03d}"], e)


def test_tie_goes_to_first_listed_bucket(spark):
    """w=8,h=7 is exactly equidistant (scaled distance 144) between
    1:1 and 4:3 — CASE first-match must pick 1:1."""
    got = {r["image_id"]: r["bucket"] for r in _assign(spark, [(8, 7)]).collect()}
    assert got["img_000"] == "1:1"


def test_rank_is_bijection_and_batches_cut_correctly(spark):
    dims = [(100 + i, 100) for i in range(3)] * 7 + [(400, 300)] * 10
    rows = _assign(spark, dims).collect()
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r["bucket"]].append(r)
    for bucket, rs in by_bucket.items():
        ranks = sorted(r["rank_in_bucket"] for r in rs)
        assert ranks == list(range(len(rs))), bucket
        size = len(rs)
        for r in rs:
            assert r["batch_id"] == r["rank_in_bucket"] // 4
            assert r["batch_full"] == ((r["batch_id"] + 1) * 4 <= size)


def test_deterministic_under_repartition(spark):
    dims = [(64 + 3 * i, 48 + 2 * i) for i in range(40)]
    df = spark.createDataFrame(
        [(f"img_{i:03d}", w, h) for i, (w, h) in enumerate(dims)],
        "image_id string, w int, h int",
    )
    a = sorted(map(tuple, aspect_bucket_batches(df, 4, n_shards=8).collect()))
    b = sorted(
        map(tuple, aspect_bucket_batches(df.repartition(13), 4, n_shards=8).collect())
    )
    assert a == b


def test_case_sql_matches_pure_python_argmin(spark):
    """The generated CASE expression == brute-force rational argmin
    over a dense grid of dims."""
    from fractions import Fraction

    dims = [(w, h) for w in range(30, 90, 7) for h in range(30, 90, 11)]

    def py_bucket(w, h):
        best, bi = None, None
        for idx, (name, bw, bh) in enumerate(ASPECT_BUCKETS):
            d = abs(Fraction(w, h) - Fraction(bw, bh))
            if best is None or d < best:
                best, bi = d, name
        return bi

    got = {r["image_id"]: r["bucket"] for r in _assign(spark, dims).collect()}
    for i, (w, h) in enumerate(dims):
        assert got[f"img_{i:03d}"] == py_bucket(w, h), (w, h)


def test_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(f"img_{i:03d}", 64, 48) for i in range(50)],
        "image_id string, w int, h int",
    )
    plan = (
        aspect_bucket_batches(df, 8, n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
