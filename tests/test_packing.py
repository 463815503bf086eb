"""Sequence packing: the distributed two-pass prefix sum must equal
the naive global-window formulation and never funnel through one
reducer."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from fundcrawler_spark.operators.packing import pack_sequences


def _naive(df, seq_len):
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("cum_incl", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("cum_incl") - F.col("n_tokens")).alias("cum_prev"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "cum_prev",
            F.expr(f"cum_prev div {seq_len}").alias("chunk_id"),
            (F.col("cum_prev") % seq_len).alias("chunk_offset"),
            ((F.col("cum_prev") % seq_len) + F.col("n_tokens") > seq_len).alias(
                "spans_chunks"
            ),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pack_equals_naive_global_window(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 113 + 1) for i in range(300)],
        "doc_id long, n_tokens long",
    ).repartition(7)
    got = pack_sequences(df, seq_len=256, n_shards=8)
    assert _rows(got) == _rows(_naive(df, 256))


def test_pack_sparse_ids_and_empty_shards(spark):
    """Gappy non-contiguous ids: some range shards hold zero docs."""
    ids = [0, 1, 5, 6, 7, 900, 901, 5000]
    df = spark.createDataFrame(
        [(i, 10 + i % 3) for i in ids], "doc_id long, n_tokens long"
    )
    got = pack_sequences(df, seq_len=16, n_shards=16)
    assert _rows(got) == _rows(_naive(df, 16))


def test_pack_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(df, seq_len=16).count() == 0


def test_pack_no_single_partition_exchange(spark):
    """The whole point: no Exchange SinglePartition anywhere in the
    physical plan (the naive global window has one)."""
    df = spark.createDataFrame(
        [(i, 5) for i in range(100)], "doc_id long, n_tokens long"
    )
    plan = (
        pack_sequences(df, seq_len=64, n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    naive_plan = (
        _naive(df, 64)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" in naive_plan  # proves the assert bites


def test_pack_boundary_semantics(spark):
    """Hand case: seq_len 10, tokens [4, 4, 4] -> third doc starts at
    offset 8 and spans into chunk 1."""
    df = spark.createDataFrame(
        [(0, 4), (1, 4), (2, 4)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: r for r in pack_sequences(df, seq_len=10).collect()}
    assert (got[0]["chunk_id"], got[0]["chunk_offset"]) == (0, 0)
    assert (got[2]["chunk_id"], got[2]["chunk_offset"]) == (0, 8)
    assert got[2]["spans_chunks"] and not got[0]["spans_chunks"]


# ------------------------------------------- patch_pack_images

def _pp(spark, dims, budget=64, patch=16, n_shards=4):
    from fundcrawler_spark.operators.packing import patch_pack_images

    df = spark.createDataFrame(
        [(f"img_{i:03d}", w, h) for i, (w, h) in enumerate(dims)],
        "image_id string, w int, h int",
    )
    return patch_pack_images(
        df, budget=budget, patch=patch, n_shards=n_shards
    )


def test_patch_counts_and_cap(spark):
    rows = {
        r["image_id"]: r
        for r in _pp(
            spark, [(16, 16), (17, 16), (33, 47), (4000, 3000)], budget=64
        ).collect()
    }
    assert rows["img_000"]["n_patches"] == 1
    assert rows["img_001"]["n_patches"] == 2      # ceil(17/16)=2
    assert rows["img_002"]["n_patches"] == 3 * 3  # ceil(33/16)*ceil(47/16)
    assert rows["img_003"]["n_patches"] == 64     # capped at budget


def test_cum_prev_is_contiguous_prefix_sum(spark):
    dims = [(16 * (1 + i % 7), 16 * (1 + i % 5)) for i in range(60)]
    rows = sorted(_pp(spark, dims).collect(), key=lambda r: r["cum_prev"])
    acc = 0
    for r in rows:
        assert r["cum_prev"] == acc
        assert r["chunk_id"] == acc // 64
        assert r["chunk_offset"] == acc % 64
        assert r["spans_chunks"] == (acc % 64 + r["n_patches"] > 64)
        acc += r["n_patches"]


def test_patch_pack_deterministic_under_repartition(spark):
    from fundcrawler_spark.operators.packing import patch_pack_images

    dims = [(30 + 9 * i, 20 + 5 * i) for i in range(40)]
    df = spark.createDataFrame(
        [(f"img_{i:03d}", w, h) for i, (w, h) in enumerate(dims)],
        "image_id string, w int, h int",
    )
    a = sorted(map(tuple, patch_pack_images(df, 128, n_shards=8).collect()))
    b = sorted(
        map(
            tuple,
            patch_pack_images(df.repartition(11), 128, n_shards=8).collect(),
        )
    )
    assert a == b


def test_patch_pack_empty_input(spark):
    out = _pp(spark, [])
    assert out.count() == 0
    assert "chunk_id" in out.columns


def test_patch_pack_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(f"img_{i:03d}", 64, 48) for i in range(50)],
        "image_id string, w int, h int",
    )
    from fundcrawler_spark.operators.packing import patch_pack_images

    plan = (
        patch_pack_images(df, 64, n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
