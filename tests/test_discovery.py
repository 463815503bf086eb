"""Recursive frontier growth: discovered links enter the frontier
exactly once (batch-distinct + frontier anti-join + seen probe), and
the crawl stays bit-exact against the simulator with discovery on."""

import shutil
import tempfile

from pyspark.sql import functions as F

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.functions.urlnorm import canonicalize_url, url_hash, url_host
from fundcrawler_spark.operators.frontier import seeds_to_frontier
from fundcrawler_spark.plans.simulator import simulate
from fundcrawler_spark.plans.wave_loop import Crawler, CrawlConfig
from fundcrawler_spark.schemas import SEEDS_SCHEMA
from fundcrawler_spark.sources.stub_transport import discovered_url


def _discover_map(spark, codes):
    df = spark.createDataFrame([(discovered_url(c),) for c in codes], "url string")
    rows = df.select(
        "url",
        url_hash(canonicalize_url(F.col("url"))).alias("h"),
        url_host(canonicalize_url(F.col("url"))).alias("host"),
    ).collect()
    return {r["url"]: (r["h"], r["host"]) for r in rows}


def test_discovery_exactly_once_and_golden(spark):
    n = 8
    seeds = spark.createDataFrame(fx.seed_rows(n), SEEDS_SCHEMA)
    codes = [r[0] for r in fx.seed_rows(n)]
    wd = tempfile.mkdtemp(prefix="disc_")
    try:
        cfg = CrawlConfig(
            fail_rate=0.04, max_fail_attempts=1, max_waves=60, n_shards=8,
            discover=True, verify_host_counts=True,
        )
        c = Crawler(spark, wd, cfg)
        stats = c.run(seeds=seeds, log=lambda *a: None)

        pages = c.pages.read(spark).collect()
        ann = [r for r in pages if r["page_type"] == "ANNOUNCE"]
        # results are appended EXACTLY ONCE per completed seed: a
        # discovered ANNOUNCE page arriving in a later interval for an
        # already-completed seed must NOT re-trigger its assembly
        # (r3 ADVICE regression: duplicate result rows in discover mode)
        res = c.results.read(spark).collect()
        rcodes = [r["fund_code"] for r in res]
        assert len(rcodes) == len(set(rcodes)), sorted(rcodes)
        assert len(rcodes) == n  # every seed completed exactly once
        # the exactly-once property: no URL is ever fetched twice, and
        # every announce page that WAS fetched is unique — despite being
        # discovered by BOTH its OVERVIEW and MANAGER pages
        assert len({r["url_hash"] for r in pages}) == len(pages)
        assert len({r["url"] for r in ann}) == len(ann)
        assert len(ann) >= 3  # discovery actually happened

        # golden conformance with discovery enabled
        rows = [r.asDict() for r in seeds_to_frontier(seeds).collect()]
        sim = simulate(
            rows, fail_rate=0.04, max_fail_attempts=1, max_waves=60,
            n_shards=8, discover_map=_discover_map(spark, codes),
        )
        assert stats["pages_fetched"] == len(sim["order"])
        assert stats["waves"] == sim["waves"]
        eng = {r["url_hash"]: (r["fetch_order"], r["wave"]) for r in pages}
        sim_last = {}
        for o, h, w in sim["order"]:
            sim_last[h] = (o, w)
        for h, ow in eng.items():
            assert sim_last[h] == ow, h
        assert set(eng) == sim["seen"]
    finally:
        shutil.rmtree(wd)


def test_discovery_with_forced_refills_golden(spark):
    """Discovery + the active/backlog split under stress: slice = one
    wave's budget (refill on essentially every wave), failures in play,
    durable checkpoints mid-run. Crawl order, wave count, seen set, and
    results-exactly-once must match the simulator bit-for-bit, with the
    incremental host-count cross-check on every wave (r3 verdict item 1:
    the split now covers discover mode)."""
    n = 24
    seeds = spark.createDataFrame(fx.seed_rows(n), SEEDS_SCHEMA)
    codes = [r[0] for r in fx.seed_rows(n)]
    wd = tempfile.mkdtemp(prefix="disc_split_")
    try:
        cfg = CrawlConfig(
            fail_rate=0.02, max_fail_attempts=1, max_waves=50, n_shards=8,
            max_budget=16, active_slice_waves=1, checkpoint_every=3,
            discover=True, verify_host_counts=True,
        )
        c = Crawler(spark, wd, cfg)
        stats = c.run(seeds=seeds, log=lambda *a: None)

        pages = c.pages.read(spark).collect()
        assert len({r["url_hash"] for r in pages}) == len(pages)  # exactly-once
        res = c.results.read(spark).collect()
        codes_out = [r["fund_code"] for r in res]
        assert len(codes_out) == len(set(codes_out)) == n

        rows = [r.asDict() for r in seeds_to_frontier(seeds).collect()]
        sim = simulate(
            rows, fail_rate=0.02, max_fail_attempts=1, max_waves=50,
            max_budget=16, n_shards=8,
            discover_map=_discover_map(spark, codes),
        )
        assert stats["pages_fetched"] == len(sim["order"])
        assert stats["waves"] == sim["waves"]
        eng = {r["url_hash"]: (r["fetch_order"], r["wave"]) for r in pages}
        sim_last = {}
        for o, h, w in sim["order"]:
            sim_last[h] = (o, w)
        assert eng == sim_last
        assert set(eng) == sim["seen"]
    finally:
        shutil.rmtree(wd)


def test_dedup_backlog_rows_drops_seen_and_pending(spark):
    """The discover-mode refill dedup: a backlog row whose URL was
    already fetched via a discovered duplicate (in the seen set), or
    whose duplicate is pending in the active slice, is dropped when it
    surfaces; everything else passes through untouched. This is the
    general URL-collision path (discovered URL == seeded URL) that the
    stub-transport goldens cannot produce — exactly-once rests on it."""
    from pyspark.sql import functions as F

    from fundcrawler_spark.operators.seen import SeenSet
    from fundcrawler_spark.plans.wave_loop import dedup_backlog_rows

    seen = SeenSet(spark, n_shards=4)
    moved = spark.createDataFrame(
        [(1, "h"), (2, "h"), (3, "h"), (4, "h")], "url_hash long, host string"
    )
    shards = seen.insert(seen.empty_shards(), spark.createDataFrame([(2,)], "url_hash long"))
    active = spark.createDataFrame([(3, "h"), (9, "h")], "url_hash long, host string")
    out = sorted(
        r["url_hash"] for r in dedup_backlog_rows(seen, shards, moved, active).collect()
    )
    assert out == [1, 4]  # 2 seen-dropped, 3 active-dropped

    # no-op pass-through when nothing collides
    out2 = sorted(
        r["url_hash"]
        for r in dedup_backlog_rows(
            seen, seen.empty_shards(), moved, active.filter(F.col("url_hash") > 100)
        ).collect()
    )
    assert out2 == [1, 2, 3, 4]


def test_announce_exhaustion_does_not_evict_seed(spark):
    """r5 ADVICE (high): a retry-exhausted DISCOVERED URL carries the
    discovering seed's seed_index, but it is not a barrier page — the
    seed must NOT be evicted from the incomplete pool, and its result
    must still assemble once all 4 barrier pages succeed.

    The fault injector is a pure function of (url_hash, attempt), so we
    search driver-side for a (fund_code, fail_rate) pair where the
    discovered ANNOUNCE URL fails its first attempt (max_retries=0 =>
    immediate exhaustion) while all 4 barrier pages succeed outright."""
    from fundcrawler_spark.sources.stub_transport import fault_kind

    pool = fx.seed_rows(64)
    codes = [r[0] for r in pool]
    dmap = _discover_map(spark, codes)
    seeds_all = spark.createDataFrame(pool, SEEDS_SCHEMA)
    barrier_by_code: dict[str, list[int]] = {}
    for r in seeds_to_frontier(seeds_all).collect():
        barrier_by_code.setdefault(codes[r["seed_index"]], []).append(r["url_hash"])

    pick = None
    for fr in (0.05, 0.1, 0.15, 0.2, 0.3, 0.4):
        for code in codes:
            ann_hash = dmap[discovered_url(code)][0]
            if fault_kind(ann_hash, 0, fr, 6) is None:
                continue  # announce wouldn't fail
            if any(fault_kind(h, 0, fr, 6) for h in barrier_by_code[code]):
                continue  # a barrier page would fail too
            pick = (code, fr)
            break
        if pick:
            break
    assert pick, "no (code, fail_rate) pair isolates the announce failure"
    code, fr = pick

    idx = codes.index(code)
    seeds = spark.createDataFrame([pool[idx][:2] + (0,)], SEEDS_SCHEMA)
    wd = tempfile.mkdtemp(prefix="disc_exh_")
    try:
        # checkpoint_every=10 puts the barrier completion (wave 0) and
        # the announce exhaustion (wave 1) in the SAME flush interval —
        # note_exhausted runs before finalize_increment, so a seed-level
        # eviction there would drop the completed seed's pages from the
        # pool before assembly (the pre-fix failure mode)
        cfg = CrawlConfig(
            fail_rate=fr, max_fail_attempts=6, max_retries=0, max_waves=20,
            n_shards=8, discover=True, verify_host_counts=True,
            checkpoint_every=10,
        )
        c = Crawler(spark, wd, cfg)
        c.run(seeds=seeds, log=lambda *a: None)
        pages = c.pages.read(spark).collect()
        # all 4 barrier pages fetched; the announce page never succeeded
        ptypes = sorted(r["page_type"] for r in pages)
        assert ptypes == sorted(["OVERVIEW", "MANAGER", "METRICS", "INCREASE"]), ptypes
        # the seed still assembled exactly one result
        res = c.results.read(spark).collect()
        assert [r["fund_code"] for r in res] == [code], res
    finally:
        shutil.rmtree(wd)
