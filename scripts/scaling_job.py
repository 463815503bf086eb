"""One fixed unit of crawl-engine work, run at a given core count.

Usage: python scripts/scaling_job.py <cores> [pages_rows] [frontier_rows]
Prints one JSON line: {"cores": N, "pages_per_sec": ..., "frontier_ops_per_sec": ...,
                       "pages_sec": ..., "frontier_sec": ...}

This is the sandbox realization of the north rule's N-vs-4N-executor
scaling requirement (BASELINE.md): the same job at local[8] and
local[32] on identical input. The job is the engine's data plane —
fetch kernel + regex parse + barrier pivot (pages/s) and frontier
build + bloom probe/insert + admission + anti-join (frontier-ops/s) —
NOT the politeness-bound single-host crawl, whose admission budget
serializes by design no matter the cluster size (SURVEY.md §7).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    pages_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    frontier_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000

    from pyspark.sql import functions as F

    from fundcrawler_spark.functions.parse import parse_all
    from fundcrawler_spark.functions.urlnorm import (
        canonicalize_url, host_salt, url_hash, url_host,
    )
    from fundcrawler_spark.operators.fetch import run_fetch
    from fundcrawler_spark.operators.politeness import admit
    from fundcrawler_spark.operators.seen import SeenSet
    from fundcrawler_spark.schemas import PAGE_TYPES
    from fundcrawler_spark.session import get_spark

    spark = get_spark(app_name=f"scaling{cores}", cores=cores,
                      shuffle_partitions=64)  # FIXED across core counts: same logical work

    # ---------------- segment 1: pages/s (fetch kernel + parse + pivot)
    n_seeds = pages_rows // 4
    seeds = spark.range(0, n_seeds).select(
        F.lpad((F.col("id") % 1000000).cast("string"), 6, "0").alias("fund_code"),
        F.col("id").alias("seed_index"),
    )
    fan = seeds.select(
        "fund_code", "seed_index",
        F.explode(F.array(*[F.lit(p) for p in PAGE_TYPES])).alias("page_type"),
    )
    from fundcrawler_spark.functions.urlnorm import build_url

    admitted_like = (
        fan.withColumn("url", build_url(F.col("page_type"), F.col("fund_code")))
        .withColumn("url_norm", canonicalize_url(F.col("url")))
        .withColumn("url_hash", url_hash(F.col("url_norm")))
        .withColumn("host", F.concat(F.lit("h"), (F.col("seed_index") % 4).cast("string")))
        .withColumn("host_salt", host_salt(F.col("host"), 32, F.col("url_norm")))
        .withColumn("retry_count", F.lit(0).cast("int"))
        .withColumn("wave", F.lit(0).cast("int"))
        .repartition(64, "host", "host_salt")
    )
    t0 = time.time()
    fetched = run_fetch(admitted_like, fail_rate=0.0, wave=0)
    parsed_cols = parse_all({p: F.col("body") for p in PAGE_TYPES})
    parsed = fetched.select(
        "seed_index", "page_type",
        *[c.alias(n) for n, c in parsed_cols.items()],
    )
    parsed.write.format("noop").mode("overwrite").save()
    pages_sec = time.time() - t0
    n_pages = pages_rows

    # ------------- segment 2: frontier ops/s (build+probe+insert+admit)
    t0 = time.time()
    raw = spark.range(0, frontier_rows).select(
        F.concat(
            F.lit("https://WWW.Host"), (F.col("id") % 64).cast("string"),
            F.lit(".example.com//p//"), F.col("id").cast("string"), F.lit("/"),
        ).alias("url"),
        F.col("id").alias("seed_index"),
    )
    fr = (
        raw.withColumn("url_norm", canonicalize_url(F.col("url")))
        .withColumn("url_hash", url_hash(F.col("url_norm")))
        .withColumn("host", url_host(F.col("url_norm")))
        .withColumn("host_salt", host_salt(F.col("host"), 32, F.col("url_norm")))
        .withColumn("page_type", F.lit("OVERVIEW"))
        .withColumn("retry_count", (F.col("seed_index") % 3).cast("int"))
        .withColumn("priority", F.col("seed_index") % 1000)
        .withColumn("wave", F.lit(0).cast("int"))
        .repartition(64, "url_hash")
        .persist()
    )
    n_fr = fr.count()
    t_build = time.time() - t0
    ss = SeenSet(spark, n_shards=64, capacity_per_shard=200_000)
    t0 = time.time()
    shards = ss.insert(ss.empty_shards(), fr.filter(F.col("seed_index") % 2 == 0).select("url_hash")).persist()
    shards.count()
    t_insert = time.time() - t0
    t0 = time.time()
    probed_n = ss.probe(shards, fr.select("url_hash", "seed_index")).filter(F.col("seen")).count()
    t_probe = time.time() - t0
    budgets = {f"host{i}.example.com": 160 for i in range(64)}
    t0 = time.time()
    admitted = admit(fr, budgets, 160).persist()
    n_adm = admitted.count()
    t_admit = time.time() - t0
    t0 = time.time()
    rest_n = fr.join(F.broadcast(admitted.select("url_hash")), "url_hash", "left_anti").count()
    t_anti = time.time() - t0
    frontier_sec = t_build + t_insert + t_probe + t_admit + t_anti

    spark.stop()
    print(json.dumps({
        "cores": cores,
        "pages_rows": n_pages,
        "pages_sec": round(pages_sec, 2),
        "pages_per_sec": round(n_pages / pages_sec, 1),
        "frontier_rows": n_fr,
        "frontier_sec": round(frontier_sec, 2),
        "steps": {"build": round(t_build,2), "insert": round(t_insert,2), "probe": round(t_probe,2),
                  "admit": round(t_admit,2), "anti": round(t_anti,2)},
        "frontier_ops_per_sec": round(3 * n_fr / frontier_sec, 1),
        "_sanity": {"probed_seen": probed_n, "admitted": n_adm, "rest": rest_n},
    }))


if __name__ == "__main__":
    main()
