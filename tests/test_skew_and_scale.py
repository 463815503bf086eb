"""Skew + sizing evidence: single-dominant-host salting actually
spreads work, and bloom shards at 10^7-key scale behave."""

import time

import numpy as np
from pyspark.sql import functions as F

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.operators.fetch import run_fetch
from fundcrawler_spark.operators.frontier import seeds_to_frontier
from fundcrawler_spark.operators.politeness import admit
from fundcrawler_spark.operators.seen import BloomShard
from fundcrawler_spark.schemas import SEEDS_SCHEMA


def test_single_host_fetch_spreads_over_partitions(spark):
    """The eastmoney case: ONE host owns the whole admitted set; the
    row-level fetch salt must still spread it across many partitions."""
    seeds = spark.createDataFrame(fx.seed_rows(500), SEEDS_SCHEMA)
    frontier = seeds_to_frontier(seeds)
    hosts = [r["host"] for r in frontier.select("host").distinct().collect()]
    assert hosts == ["fundf10.eastmoney.com"], hosts  # truly single-host
    admitted = admit(frontier, {hosts[0]: 160}, 160)
    fetched = run_fetch(admitted, fail_rate=0.0, wave=0)
    n_parts = (
        fetched.select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts >= 8, f"single host collapsed to {n_parts} fetch partitions"


def test_single_host_frontier_salt_distribution(spark):
    seeds = spark.createDataFrame(fx.seed_rows(2000), SEEDS_SCHEMA)
    frontier = seeds_to_frontier(seeds, n_salts=32)
    dist = frontier.groupBy("host_salt").count().collect()
    counts = [r["count"] for r in dist]
    assert len(counts) == 32  # every salt bucket populated
    assert max(counts) < 3 * min(counts)  # roughly even


def test_bloom_shard_at_ten_million_keys():
    """Sizing math from SURVEY.md §4.1: a 10^7-key shard at 1% FPR is
    ~12 MB and keeps its FPR — 1000 such shard-groups cover 10^10 keys."""
    b = BloomShard.sized(10_000_000, fpr=0.01)
    assert 10 * 2**20 < len(b.to_blob()) < 16 * 2**20
    rng = np.random.RandomState(7)
    keys = rng.randint(-(2**62), 2**62, 1_000_000, dtype=np.int64)
    t0 = time.time()
    b.insert(keys)
    assert b.contains(keys).all()
    dt = time.time() - t0
    probe = rng.randint(-(2**62), 2**62, 200_000, dtype=np.int64)
    fpr = b.contains(probe).mean()  # inserted 10% of capacity -> fpr << 1%
    assert fpr < 0.01
    assert dt < 30, f"1M insert+probe took {dt:.1f}s"
