"""Extra benchmarks (bench.py is frozen for measurement — guide §1.4
noop-sink isolation and phase telemetry live here).

Usage:
  python bench_extra.py crawl      # bench.py's crawl config + per-wave phase telemetry
  python bench_extra.py queries q1 q2 ...   # noop-isolated per-query timings at $SPARK_GRAFT_SF_DIR
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def crawl_telemetry() -> None:
    from fundcrawler_spark import fixtures as fx
    from fundcrawler_spark.plans.wave_loop import Crawler, CrawlConfig
    from fundcrawler_spark.schemas import SEEDS_SCHEMA
    from fundcrawler_spark.session import get_spark

    spark = get_spark(app_name="bench_extra_crawl", cores=CPUS, shuffle_partitions=CPUS)
    n_seeds = int(os.environ.get("BENCH_SEEDS", "2000"))
    seeds = spark.createDataFrame(fx.seed_rows(n_seeds), SEEDS_SCHEMA)
    wd = tempfile.mkdtemp(prefix="bench_extra_crawl_")
    waves: list[dict] = []
    try:
        cfg = CrawlConfig(
            fail_rate=0.0, max_waves=200, n_shards=32,
            init_budget=160.0, max_budget=160, checkpoint_every=5,
            shard_capacity=100_000,
            wave_hook=waves.append,
        )
        t0 = time.time()
        stats = Crawler(spark, wd, cfg).run(seeds=seeds, log=lambda *a: None)
        dt = time.time() - t0
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    steady = [w for w in waves if not w["durable_ckpt"] and not w["refilled_hosts"]]
    ckpt = [w for w in waves if w["durable_ckpt"]]
    def med(key, rows):
        vals = [r[key] for r in rows if key in r]
        return round(statistics.median(vals), 3) if vals else None
    print(json.dumps({
        "crawl_sec": round(dt, 2),
        "pages_per_sec": round(stats["pages_fetched"] / dt, 2),
        "waves": stats["waves"],
        "steady_waves": len(steady),
        "steady_median": {k: med(k, steady) for k in
                          ("refill_sec", "fetch_agg_sec", "discover_sec",
                           "checkpoint_sec", "wave_sec")},
        "ckpt_waves": len(ckpt),
        "ckpt_median": {k: med(k, ckpt) for k in sorted(
            {key for w in ckpt for key in w} - {"wave", "n_admitted",
             "refilled_hosts", "durable_ckpt"})},
    }))
    spark.stop()


def query_timings(names: list[str]) -> None:
    from fundcrawler_spark.entry_queries import QUERIES
    from fundcrawler_spark.session import get_spark

    spark = get_spark(app_name="bench_extra_q", cores=CPUS, shuffle_partitions=CPUS)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(lambda it: it, "x int").count()
    out = {}
    for name in names:
        fn, _ = QUERIES[name]
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1:2] == ["crawl"]:
        crawl_telemetry()
    else:
        query_timings(sys.argv[2:])
