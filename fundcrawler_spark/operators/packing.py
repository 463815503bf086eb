"""Sequence packing for LLM training-data pipelines: concatenate
documents (in deterministic id order) into fixed-length token windows
and give every document its (chunk_id, chunk_offset) coordinates.

The textbook formulation is one global ordered window — an exchange
to a SINGLE partition, the canonical Spark anti-pattern (the same one
the round-5 review flagged in fetch-order and that operators/asof.py
avoids). Implemented instead as a distributed two-pass prefix sum:

1. contiguous range shards: ``shard = id div span`` with
   ``span = ceil((max_id + 1) / n_shards)`` — one scalar aggregate;
   range sharding (not hash) keeps global id order == (shard, id)
   order, which is what makes per-shard prefix sums composable;
2. per-shard token totals to the driver (``n_shards`` rows, bounded),
   exclusive shard offsets broadcast back;
3. within-shard cumulative sum over a window PARTITIONED by shard.

Every shuffle is keyed by shard; nothing funnels through one reducer,
so the shape survives a 100-TB corpus (raise ``n_shards`` with the
cluster — it only has to exceed executor-level parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_shards: int = 32,
) -> DataFrame:
    """Input: (id_col: non-negative integral, tokens_col: integral).
    Output adds ``cum_prev`` (exclusive prefix sum of tokens in id
    order), ``chunk_id = cum_prev div seq_len``, ``chunk_offset =
    cum_prev % seq_len``, and ``spans_chunks`` (doc straddles a chunk
    boundary). All integer math — deterministic and engine-exact."""
    mx = df.agg(F.max(F.col(id_col).cast("long")).alias("mx")).collect()[0]["mx"]
    if mx is None:
        return df.sparkSession.createDataFrame(
            [],
            f"{id_col} long, {tokens_col} long, cum_prev long, "
            "chunk_id long, chunk_offset long, spans_chunks boolean",
        )
    span = max(1, (int(mx) + n_shards) // n_shards)
    base = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.expr(f"CAST({id_col} AS BIGINT) div {span}").alias("shard"),
    )
    totals = base.groupBy("shard").agg(F.sum(tokens_col).alias("tot")).collect()
    offs, acc = [], 0
    for r in sorted(totals, key=lambda r: r["shard"]):
        offs.append((r["shard"], acc))
        acc += r["tot"]
    off_df = df.sparkSession.createDataFrame(offs, "shard long, shard_off long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = (
        base.join(F.broadcast(off_df), "shard")
        .withColumn("cum_incl", F.sum(tokens_col).over(w))
        .select(
            id_col,
            tokens_col,
            (F.col("shard_off") + F.col("cum_incl") - F.col(tokens_col)).alias(
                "cum_prev"
            ),
        )
    )
    return packed.select(
        id_col,
        tokens_col,
        "cum_prev",
        F.expr(f"cum_prev div {int(seq_len)}").alias("chunk_id"),
        (F.col("cum_prev") % seq_len).alias("chunk_offset"),
        (
            (F.col("cum_prev") % seq_len) + F.col(tokens_col) > seq_len
        ).alias("spans_chunks"),
    )
