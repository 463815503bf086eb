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
