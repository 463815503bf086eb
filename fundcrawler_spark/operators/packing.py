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


# --------------------------------------------- aspect-ratio bucketing

# (name, bw, bh) — the fixed ratio grid multimodal trainers bucket
# into so each batch shares one canvas shape (variable-aspect batches
# waste pad pixels). First-listed wins distance ties.
ASPECT_BUCKETS: tuple[tuple[str, int, int], ...] = (
    ("1:1", 1, 1),
    ("4:3", 4, 3),
    ("3:4", 3, 4),
    ("16:9", 16, 9),
    ("9:16", 9, 16),
    ("3:2", 3, 2),
    ("2:3", 2, 3),
)


def _lcm(nums):
    import math

    out = 1
    for n in nums:
        out = out * n // math.gcd(out, n)
    return out


def aspect_bucket_case_sql(
    w: str = "w", h: str = "h",
    buckets: tuple[tuple[str, int, int], ...] = ASPECT_BUCKETS,
) -> str:
    """One CASE expression assigning the nearest aspect bucket with
    EXACT integer math — |w/h - bw/bh| comparisons cross-multiplied
    and scaled by lcm(bh) so no division ever happens. The SAME string
    is parsed by Spark (F.expr) and DuckDB, so the assignment cannot
    drift between engines. First bucket wins ties (CASE first-match ==
    smallest-index argmin; see test_aspect_buckets for the proof
    case)."""
    scale = _lcm([bh for _, _, bh in buckets])
    ds = [
        f"(abs({w} * {bh} - {h} * {bw}) * {scale // bh})"
        for _, bw, bh in buckets
    ]
    whens = []
    for i in range(len(buckets) - 1):
        cond = " AND ".join(
            f"{ds[i]} <= {ds[j]}" for j in range(i + 1, len(buckets))
        )
        whens.append(f"WHEN {cond} THEN '{buckets[i][0]}'")
    return (
        "CASE " + " ".join(whens) + f" ELSE '{buckets[-1][0]}' END"
    )


def aspect_bucket_batches(
    meta: DataFrame,
    batch_size: int = 8,
    id_col: str = "image_id",
    n_shards: int = 32,
    buckets: tuple[tuple[str, int, int], ...] = ASPECT_BUCKETS,
) -> DataFrame:
    """Aspect-ratio bucketed BATCH composition for image training:
    assign each image (by its decoded w x h) to the nearest ratio
    bucket, then number images within each bucket and cut fixed-size
    batches. Output: (id, w, h, bucket, rank_in_bucket, batch_id,
    batch_full) — batch_full=false marks the ragged tail batch a
    loader would drop or pad.

    The naive numbering is row_number() over a window partitioned by
    BUCKET — a handful of reducers swallowing the whole corpus (the
    bucket count is ~7, so that's the single-partition anti-pattern
    with seven partitions). Instead the same two-pass shape as
    pack_sequences: hash shards WITHIN each bucket (cross-engine
    poly_hash, so the oracle can replay it), per-(bucket, shard)
    counts to the driver (bounded: buckets x n_shards rows),
    exclusive offsets broadcast back, window partitioned by (bucket,
    shard). Rank is a deterministic bijection 0..bucket_size-1 for
    any fixed n_shards (shard-major, id-ordered within shard), which
    is what a training loader needs — reproducible batches, not
    globally id-sorted ones.
    """
    from .textstats import poly_hash

    b = meta.select(
        F.col(id_col),
        F.col("w").cast("int").alias("w"),
        F.col("h").cast("int").alias("h"),
        F.expr(aspect_bucket_case_sql("w", "h", buckets)).alias("bucket"),
        F.pmod(poly_hash(F.col(id_col)), F.lit(int(n_shards))).alias("shard"),
    )
    counts = (
        b.groupBy("bucket", "shard").agg(F.count("*").alias("c")).collect()
    )
    per_bucket: dict[str, list] = {}
    for r in counts:
        per_bucket.setdefault(r["bucket"], []).append((r["shard"], r["c"]))
    rows = []
    for bucket, shards in per_bucket.items():
        total = sum(c for _, c in shards)
        acc = 0
        for shard, c in sorted(shards):
            rows.append((bucket, shard, acc, total))
            acc += c
    off_df = meta.sparkSession.createDataFrame(
        rows, "bucket string, shard long, off long, bucket_size long"
    )
    w_rank = Window.partitionBy("bucket", "shard").orderBy(id_col)
    out = (
        b.join(F.broadcast(off_df), ["bucket", "shard"])
        .withColumn("rn", F.row_number().over(w_rank).cast("long"))
        .withColumn("rank_in_bucket", F.col("off") + F.col("rn") - 1)
    )
    bs = int(batch_size)
    return out.select(
        id_col,
        "w",
        "h",
        "bucket",
        "rank_in_bucket",
        F.expr(f"rank_in_bucket div {bs}").alias("batch_id"),
        (
            (F.expr(f"rank_in_bucket div {bs}") + 1) * bs
            <= F.col("bucket_size")
        ).alias("batch_full"),
    )


# --------------------------------------------- patch-budget packing

def patch_pack_images(
    meta: DataFrame,
    budget: int = 1024,
    patch: int = 16,
    id_col: str = "image_id",
    n_shards: int = 32,
) -> DataFrame:
    """NaViT-style patch packing for variable-resolution image
    training (Dehghani et al. 2023): each image contributes
    ``n_patches = ceil(w/patch) * ceil(h/patch)`` vision-transformer
    tokens (capped at ``budget`` — an image too big for one sequence
    is downsampled to fit, so the cap IS the resize rule), and images
    are concatenated in a deterministic order into fixed
    ``budget``-token sequences. Output adds (n_patches, cum_prev,
    chunk_id, chunk_offset, spans_chunks) — same coordinate system as
    ``pack_sequences`` gives documents.

    Global order is (shard, image_id) with ``shard =
    poly_hash(image_id) % n_shards`` — the cross-engine hash, so a SQL
    oracle can replay the exact packing. The prefix sum never funnels
    through one reducer: per-shard totals go to the driver (bounded:
    ``n_shards`` rows), exclusive shard offsets broadcast back, the
    window is partitioned by shard. Any fixed order works for a
    training loader; this one is reproducible AND scale-safe.
    """
    from .textstats import poly_hash

    b_ = int(budget)
    p_ = int(patch)
    base = meta.select(
        F.col(id_col),
        F.col("w").cast("int").alias("w"),
        F.col("h").cast("int").alias("h"),
        F.least(
            F.expr(f"(CAST(w AS BIGINT) + {p_ - 1}) div {p_}")
            * F.expr(f"(CAST(h AS BIGINT) + {p_ - 1}) div {p_}"),
            F.lit(b_).cast("long"),
        ).alias("n_patches"),
        F.pmod(poly_hash(F.col(id_col)), F.lit(int(n_shards))).alias("shard"),
    )
    totals = base.groupBy("shard").agg(F.sum("n_patches").alias("tot")).collect()
    offs, acc = [], 0
    for r in sorted(totals, key=lambda r: r["shard"]):
        offs.append((r["shard"], acc))
        acc += r["tot"]
    if not offs:
        return meta.sparkSession.createDataFrame(
            [],
            f"{id_col} string, w int, h int, n_patches long, cum_prev long, "
            "chunk_id long, chunk_offset long, spans_chunks boolean",
        )
    off_df = meta.sparkSession.createDataFrame(offs, "shard long, shard_off long")
    w_cum = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(off_df), "shard")
        .withColumn("cum_incl", F.sum("n_patches").over(w_cum))
        .withColumn(
            "cum_prev",
            F.col("shard_off") + F.col("cum_incl") - F.col("n_patches"),
        )
        .select(
            id_col,
            "w",
            "h",
            "n_patches",
            "cum_prev",
            F.expr(f"cum_prev div {b_}").alias("chunk_id"),
            (F.col("cum_prev") % b_).alias("chunk_offset"),
            ((F.col("cum_prev") % b_) + F.col("n_patches") > b_).alias(
                "spans_chunks"
            ),
        )
    )


# ----------------------------------------------------------- Z-order
def zorder_key_sql(
    u: str, v: str,
    u_min: int, u_max: int, v_min: int, v_max: int,
    bits: int = 16, div_op: str = "div",
) -> str:
    """Morton / Z-order interleave of two integer columns as ONE
    generated integer-SQL expression (the aspect-bucket CASE pattern:
    the same generated text drives both engines, only the integer-div
    spelling differs — Spark ``div``, DuckDB ``//``).

    Each column is first scaled onto [0, 2^bits) with exact integer
    math ((v - min) * (2^bits - 1) div span); bit k of the scaled
    value is extracted as ``(s div 2^k) % 2`` (no shift operators —
    div/mod exist everywhere) and placed at position 2k / 2k+1. Bits
    are disjoint so ``+`` assembles the key. min/max come from one
    tiny driver aggregate — the pack_sequences offset pattern.

    Why: sorting by this key gives every output file a contiguous
    Z-range, which makes per-file min/max TIGHT ON BOTH COLUMNS at
    once — the clustering step (Iceberg/Delta OPTIMIZE ZORDER) that
    turns footer-stats pruning from one-column to multi-column
    selectivity.
    """
    return zorder_key_cols_sql(
        u, v, str(int(u_min)), str(int(u_max)), str(int(v_min)),
        str(int(v_max)), bits=bits, div_op=div_op,
    )


def zorder_key_cols_sql(
    u: str, v: str,
    u_min: str, u_max: str, v_min: str, v_max: str,
    bits: int = 16, div_op: str = "div",
) -> str:
    """zorder_key_sql with the scale bounds as SQL EXPRESSIONS (column
    references from a cross-joined 1-row stats aggregate) instead of
    driver literals — lets a query compute min/max inside the plan on
    both engines, no driver round-trip."""
    def scaled(col: str, mn: str, mx: str) -> str:
        span = f"greatest(1, ({mx}) - ({mn}))"
        return f"(((({col}) - ({mn})) * {(1 << bits) - 1}) {div_op} {span})"

    su, sv = scaled(u, u_min, u_max), scaled(v, v_min, v_max)
    terms = []
    for k in range(bits):
        terms.append(f"((({su}) {div_op} {1 << k}) % 2) * {1 << (2 * k)}")
        terms.append(f"((({sv}) {div_op} {1 << k}) % 2) * {1 << (2 * k + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_key_py(
    u: int, v: int,
    u_min: int, u_max: int, v_min: int, v_max: int,
    bits: int = 16,
) -> int:
    """Pure-Python twin of zorder_key_sql for tests."""
    def scaled(x, mn, mx):
        return ((x - mn) * ((1 << bits) - 1)) // max(1, mx - mn)

    su, sv = scaled(u, u_min, u_max), scaled(v, v_min, v_max)
    out = 0
    for k in range(bits):
        out += ((su >> k) & 1) << (2 * k)
        out += ((sv >> k) & 1) << (2 * k + 1)
    return out
