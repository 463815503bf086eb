"""Exact per-group quantiles without a per-group single reducer.

``F.percentile`` over ``groupBy(g)`` ships EVERY value of a group to
one reducer (r6 verdict's one perf-weak plan: 5 event types at 100 TB
= 5 reducers swallowing ~20 TB each). This operator computes the same
doubles — bit for bit — as a distributed selection problem:

  1. per-group non-null counts (map-side combinable) fix each wanted
     order statistic's 0-based global index: ``pos = (n-1)*q``,
     ``lo = floor(pos)``, ``hi = ceil(pos)``;
  2. the values are range-partitioned by (group, value) and sorted
     within partitions (an even sort — no group lands on one task
     unless its values are all equal, the same bound a global
     ``orderBy`` has), then pinned so both passes read the SAME
     partitioning (range boundaries are sampled per execution);
  3. per-(partition, group) counts -> a driver prefix sum (group
     cardinality x partitions rows — control-plane sized) locates each
     wanted index's partition and local offset, the exact trick
     operators/fetch.py uses for crawl order;
  4. one mapInPandas pass picks the located values; the interpolation
     ``(hi - pos) * x_lo + (pos - lo) * x_hi`` is evaluated with the
     same term order as Spark's ``Percentile.getPercentile`` (pinned by
     tests/test_quantiles.py against F.percentile on random data).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    q_names: list[str] | None = None,
) -> DataFrame:
    """(group, n, <one column per q>) — identical values to
    ``groupBy(group).agg(count(*), percentile(value, q)...)``.

    ``n`` counts ALL rows of the group; the order statistics ignore
    null values (both exactly as the aggregate form does). Groups whose
    values are all null yield null quantiles.
    """
    q_names = q_names or [f"q{int(q * 100)}" for q in qs]
    assert len(q_names) == len(qs)
    spark = df.sparkSession

    base = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    counts = {
        r["g"]: (r["n_all"], r["n_val"])
        for r in base.groupBy("g")
        .agg(F.count("*").alias("n_all"), F.count("v").alias("n_val"))
        .collect()
    }

    # wanted 0-based indexes per group (dedup: p95/p99 may collide)
    wanted: dict[object, set[int]] = {}
    specs: dict[object, list[tuple[float, int, int, float]]] = {}
    for g, (_, n_val) in counts.items():
        specs[g] = []
        for q in qs:
            if n_val == 0:
                specs[g].append((0.0, -1, -1, q))
                continue
            pos = (n_val - 1) * q
            lo, hi = math.floor(pos), math.ceil(pos)
            specs[g].append((pos, lo, hi, q))
            wanted.setdefault(g, set()).update((lo, hi))

    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    ranged = (
        base.filter(F.col("v").isNotNull())
        .repartitionByRange(n_parts, F.col("g"), F.col("v"))
        .sortWithinPartitions("g", "v")
        # pin: range boundaries are sampled per execution, so the
        # offsets pass and the pick pass MUST observe one partitioning
        .persist()
    )
    part_counts = (
        ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid", "g")
        .count()
        .collect()
    )
    # prefix sum in (pid asc) order = global sorted offsets per group
    offsets: dict[object, list[tuple[int, int, int]]] = {}
    run: dict[object, int] = {}
    for r in sorted(part_counts, key=lambda r: r["pid"]):
        start = run.get(r["g"], 0)
        offsets.setdefault(r["g"], []).append((r["pid"], start, r["count"]))
        run[r["g"]] = start + r["count"]

    # per-partition pick list: pid -> [(g, local_idx, global_idx)]
    picks: dict[int, list[tuple[object, int, int]]] = {}
    for g, idxs in wanted.items():
        spans = offsets.get(g, [])
        for gi in sorted(idxs):
            for pid, start, cnt in spans:
                if start <= gi < start + cnt:
                    picks.setdefault(pid, []).append((g, gi - start, gi))
                    break

    def pick_kernel(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        todo = sorted(picks.get(pid, []), key=lambda t: (str(t[0]), t[1]))
        if not todo:
            for _ in batches:
                pass
            return
        # local cursor per group across batches (values arrive sorted)
        seen: dict[object, int] = {}
        out_g, out_i, out_v = [], [], []
        for pdf in batches:
            for g, li, gi in todo:
                sub = pdf[pdf["g"] == g]
                if len(sub) == 0:
                    continue
                base_seen = seen.get(g, 0)
                if base_seen <= li < base_seen + len(sub):
                    out_g.append(g)
                    out_i.append(gi)
                    out_v.append(float(sub["v"].iloc[li - base_seen]))
            for g in pdf["g"].unique():
                seen[g] = seen.get(g, 0) + int((pdf["g"] == g).sum())
        yield pd.DataFrame({"g": out_g, "gi": out_i, "v": out_v})

    g_type = dict(base.dtypes)["g"]
    picked = {
        (r["g"], r["gi"]): r["v"]
        for r in ranged.mapInPandas(
            pick_kernel, f"g {g_type}, gi long, v double"
        ).collect()
    }
    ranged.unpersist()

    # assemble: same term order as Percentile.getPercentile —
    # (hi - pos) * lower + (pos - lo) * higher; lo == hi -> the value
    rows = []
    for g, (n_all, _) in counts.items():
        vals: list[float | None] = []
        for pos, lo, hi, _q in specs[g]:
            if lo < 0:
                vals.append(None)
            elif lo == hi:
                vals.append(picked[(g, lo)])
            else:
                vals.append(
                    (hi - pos) * picked[(g, lo)] + (pos - lo) * picked[(g, hi)]
                )
        rows.append((g, n_all, *vals))
    schema = f"{group_col} {g_type}, n long, " + ", ".join(
        f"{name} double" for name in q_names
    )
    return spark.createDataFrame(rows, schema)
