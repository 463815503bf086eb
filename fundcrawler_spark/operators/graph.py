"""Fixed-point PageRank for crawl-frontier prioritization.

Real crawlers order their frontier by link authority (OPIC, Cho &
Garcia-Molina; PageRank over the discovered link graph) so high-value
pages are fetched before the long tail. This is the iterative-join
formulation of PageRank, with one twist that makes it ORACLE-EXACT:
every arithmetic step is integer math. Per-edge contribution is
``(rank * damp_num) div (damp_den * outdeg)`` — an integer — so the
per-destination aggregation is a sum of integers, which is associative
and order-independent; float PageRank differs between engines (and
between runs!) because float addition is not. Ranks are scaled by
``scale`` (rank 1.0 == `scale`).

Dangling nodes (no out-edges) simply leak their damped mass — the
standard simplification when ranks are used for ORDERING, documented
here so the oracle replays it identically.

Scale shape per iteration: one hash join ranks⋈edges keyed by src, one
groupBy(dst) partial-aggregated sum, one left join back to the node
set — every shuffle keyed by node id, nothing funnels through a single
reducer, O(iters) stages. Parallel edges are honored as weights (a
page linking twice contributes twice), identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """edges: (src: long, dst: long). Returns (node: long, rank: long)
    for every node appearing as src or dst; rank `scale` == 1.0."""
    src = edges.select(F.col("src").cast("long").alias("src"),
                       F.col("dst").cast("long").alias("dst"))
    nodes = (
        src.select(F.col("src").alias("node"))
        .union(src.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = src.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = (int(scale) * (damp_den - damp_num)) // damp_den
    # the join inputs are reused every iteration — pin them so each
    # round reads materialized blocks instead of recomputing the
    # distinct/groupBy lineage (released after the loop)
    nodes = nodes.persist()
    outdeg = outdeg.persist()
    ranks = nodes.withColumn("rank", F.lit(int(scale)).cast("long"))
    for it in range(int(iters)):
        contribs = (
            src.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank * {damp_num}) div ({damp_den} * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
        # truncate lineage each round (r6 verdict item 5): without
        # this, the plan stacks one join+agg per iteration and compile
        # time blows up at the 20-50 iterations a real
        # frontier-prioritization run wants (same lazy-localCheckpoint
        # truncation the wave loop's shard folds use). The LAST round
        # checkpoints eagerly so the caches below can be released
        # without forcing a later recompute of nodes/outdeg.
        ranks = ranks.localCheckpoint(eager=it == int(iters) - 1)
    nodes.unpersist()
    outdeg.unpersist()
    return ranks
