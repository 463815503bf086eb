"""Incomplete-seeds pool boundedness: retry-exhausted seeds are evicted
(they can never pass the 4-page barrier), discover-mode ANNOUNCE pages
never enter, and resume reads the checkpointed pool instead of scanning
the pages table."""

import shutil
import tempfile

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.plans.wave_loop import Crawler, CrawlConfig
from fundcrawler_spark.schemas import PAGE_TYPES, SEEDS_SCHEMA


def test_pool_drains_under_permanent_failures(spark):
    """Inject permanent failures (stub keeps failing past the crawler's
    retry cap): the exhausted seeds' partial pages must leave the pool
    (it drains to zero once the frontier drains), results hold exactly
    the seeds that completed all 4 pages, and images cover exactly the
    fetched pages (r4 verdict item 4)."""
    n = 12
    seeds = spark.createDataFrame(fx.seed_rows(n), SEEDS_SCHEMA)
    # max_fail_attempts=5 > max_retries=2 -> a URL that draws failures
    # at attempts 0..2 leaves the frontier without ever succeeding.
    # Warm budget: the AIMD latch (any failure zeroes the budget until
    # the 10-wave ring is clean) would otherwise stretch the crawl.
    cfg = CrawlConfig(fail_rate=0.5, max_fail_attempts=5, max_retries=2,
                      max_waves=60, n_shards=8, checkpoint_every=3,
                      init_budget=160.0)
    wd = tempfile.mkdtemp(prefix="exh_")
    try:
        c = Crawler(spark, wd, cfg)
        stats = c.run(seeds=seeds, log=lambda *a: None)
        assert stats["waves"] < 60  # drained, not truncated
        assert stats["exhausted_seeds"] > 0  # injection actually bit
        assert stats["incomplete_pool_rows"] == 0  # the pool drained

        pages = c.pages.read(spark).collect()
        by_seed = {}
        for r in pages:
            if r["page_type"] in PAGE_TYPES:
                by_seed.setdefault(r["seed_index"], set()).add(r["page_type"])
        complete = {s for s, pts in by_seed.items() if len(pts) == len(PAGE_TYPES)}
        assert 0 < len(complete) < n  # a real mix of outcomes

        res = c.results.read(spark)
        res_rows = res.collect() if res is not None else []
        seed_code = {r[2]: r[0] for r in fx.seed_rows(n)}  # seed_index->code
        assert sorted(r["fund_code"] for r in res_rows) == sorted(
            seed_code[s] for s in complete
        )
        # incremental assembly == full recompute despite evictions
        from fundcrawler_spark.operators.assemble import assemble_results

        seeds_back = spark.read.parquet(f"{wd}/seeds.parquet")
        full = sorted(map(tuple, assemble_results(
            c.pages.read(spark).select("seed_index", "page_type", "body"),
            seeds_back).collect()))
        assert sorted(map(tuple, res_rows)) == full
        img = c.images.read(spark)
        assert img.count() == len(pages)
    finally:
        shutil.rmtree(wd)


def test_pool_drains_in_discover_mode(spark):
    """Discover mode: ANNOUNCE pages are not barrier pages, so they must
    never enter the incomplete pool — after every seed completes, the
    pool is empty (the in-run bound does not degrade toward
    O(discovered pages); driver-advice follow-up)."""
    n = 8
    seeds = spark.createDataFrame(fx.seed_rows(n), SEEDS_SCHEMA)
    cfg = CrawlConfig(fail_rate=0.04, max_fail_attempts=1, max_waves=60,
                      n_shards=8, discover=True, checkpoint_every=2)
    wd = tempfile.mkdtemp(prefix="discpool_")
    try:
        c = Crawler(spark, wd, cfg)
        stats = c.run(seeds=seeds, log=lambda *a: None)
        assert stats["incomplete_pool_rows"] == 0
        assert stats["results"] == n
        ann = [r for r in c.pages.read(spark).collect()
               if r["page_type"] == "ANNOUNCE"]
        assert len(ann) >= 3  # discovery actually happened
    finally:
        shutil.rmtree(wd)


def test_resume_reads_pool_not_pages_table(spark):
    """Resume must rebuild the incomplete pool from the checkpoint's
    own pool parquet (O(pool)) — never by scanning the pages table
    (O(all fetched pages); r4 verdict item 7). The pages table is
    instrumented: zero reads during the resumed run."""
    seeds = spark.createDataFrame(fx.seed_rows(8), SEEDS_SCHEMA)
    full = CrawlConfig(fail_rate=0.08, max_fail_attempts=1, max_waves=25,
                       n_shards=8, checkpoint_every=3)
    half = CrawlConfig(fail_rate=0.08, max_fail_attempts=1, max_waves=5,
                       n_shards=8, checkpoint_every=3)
    wd1, wd2 = tempfile.mkdtemp(prefix="plA_"), tempfile.mkdtemp(prefix="plB_")
    try:
        c1 = Crawler(spark, wd1, full)
        s1 = c1.run(seeds=seeds, log=lambda *a: None)

        Crawler(spark, wd2, half).run(seeds=seeds, log=lambda *a: None)
        c2 = Crawler(spark, wd2, full)
        reads = []
        orig_read = c2.pages.read
        c2.pages.read = lambda s: (reads.append(1), orig_read(s))[1]
        s2 = c2.run(resume=True, log=lambda *a: None)
        assert reads == []  # pool came from the checkpoint, not a scan
        c2.pages.read = orig_read

        assert (s1["waves"], s1["pages_fetched"]) == (s2["waves"], s2["pages_fetched"])
        r1 = sorted(map(tuple, c1.results.read(spark).collect()))
        r2 = sorted(map(tuple, c2.results.read(spark).collect()))
        assert r1 == r2
    finally:
        shutil.rmtree(wd1)
        shutil.rmtree(wd2)


def test_resume_after_exhaustion_keeps_pool_clean(spark):
    """A seed exhausted BEFORE the checkpoint must stay evicted after
    resume, including when a sibling page of that seed arrives after the
    resume boundary — the exhausted set rides the checkpoint."""
    seeds = spark.createDataFrame(fx.seed_rows(12), SEEDS_SCHEMA)
    full = CrawlConfig(fail_rate=0.5, max_fail_attempts=5, max_retries=2,
                       max_waves=60, n_shards=8, checkpoint_every=3,
                       init_budget=160.0)
    half = CrawlConfig(fail_rate=0.5, max_fail_attempts=5, max_retries=2,
                       max_waves=12, n_shards=8, checkpoint_every=3,
                       init_budget=160.0)
    wd1, wd2 = tempfile.mkdtemp(prefix="exA_"), tempfile.mkdtemp(prefix="exB_")
    try:
        c1 = Crawler(spark, wd1, full)
        s1 = c1.run(seeds=seeds, log=lambda *a: None)
        Crawler(spark, wd2, half).run(seeds=seeds, log=lambda *a: None)
        c2 = Crawler(spark, wd2, full)
        s2 = c2.run(resume=True, log=lambda *a: None)
        assert s2["incomplete_pool_rows"] == 0
        assert s2["exhausted_seeds"] == s1["exhausted_seeds"] > 0
        assert (s1["waves"], s1["pages_fetched"]) == (s2["waves"], s2["pages_fetched"])
        r1 = sorted(map(tuple, c1.results.read(spark).collect()))
        r2 = sorted(map(tuple, c2.results.read(spark).collect()))
        assert r1 == r2
    finally:
        shutil.rmtree(wd1)
        shutil.rmtree(wd2)
