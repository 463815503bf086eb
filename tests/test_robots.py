from fundcrawler_spark.operators.politeness import RobotsMatcher, robots_filter


def test_longest_match_wins():
    m = RobotsMatcher(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nDisallow: /tmp$\n"
    )
    assert m.allowed("/")
    assert not m.allowed("/private/x")
    assert m.allowed("/private/ok/page")
    assert not m.allowed("/tmp")
    assert m.allowed("/tmp/file")  # $-anchored rule


def test_agent_group_selection():
    txt = "User-agent: evilbot\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    assert RobotsMatcher(txt, agent="fundcrawler").allowed("/x")
    assert not RobotsMatcher(txt, agent="evilbot").allowed("/x")


def test_wildcard_rules():
    m = RobotsMatcher("User-agent: *\nDisallow: /*.aspx\n")
    assert not m.allowed("/FundArchivesDatas.aspx")
    assert m.allowed("/jbgk_000001.html")


def test_robots_filter_df(spark):
    df = spark.createDataFrame(
        [
            ("h1", "http://h1/ok"),
            ("h1", "http://h1/private/x"),
            ("h2", "http://h2/anything"),
        ],
        "host string, url_norm string",
    )
    robots = {"h1": "User-agent: *\nDisallow: /private/\n"}
    out = {r["url_norm"] for r in robots_filter(df, robots).collect()}
    assert out == {"http://h1/ok", "http://h2/anything"}


def test_crawl_delay_parsed_and_capped():
    m = RobotsMatcher("User-agent: *\nCrawl-delay: 0.5\nDisallow: /x\n")
    assert m.crawl_delay == 0.5
    assert m.budget_cap(1.0) == 2
    assert m.budget_cap(0.1) == 1  # floor 1
    assert RobotsMatcher("User-agent: *\n").budget_cap(1.0) is None


def test_crawl_delay_caps_admission(spark):
    import shutil
    import tempfile

    from fundcrawler_spark import fixtures as fx
    from fundcrawler_spark.fixtures import EASTMONEY_HOST
    from fundcrawler_spark.plans.wave_loop import Crawler, CrawlConfig
    from fundcrawler_spark.schemas import SEEDS_SCHEMA

    seeds = spark.createDataFrame(fx.seed_rows(4), SEEDS_SCHEMA)
    wd = tempfile.mkdtemp(prefix="cd_")
    try:
        cfg = CrawlConfig(
            fail_rate=0.0, max_waves=30, n_shards=4, init_budget=100.0,
            robots_by_host={EASTMONEY_HOST: "User-agent: *\nCrawl-delay: 0.25\nAllow: /\n"},
        )
        c = Crawler(spark, wd, cfg)
        c.run(seeds=seeds, log=lambda *a: None)
        log = c.fetch_log.read(spark)
        per_wave = log.groupBy("wave").sum("n_admitted").collect()
        # cap = wave_seconds/delay = 4 requests per wave despite budget 100
        assert all(r["sum(n_admitted)"] <= 4 for r in per_wave), per_wave
        assert len(per_wave) >= 4  # 16 pages at <=4/wave
    finally:
        shutil.rmtree(wd)


def test_equal_length_allow_beats_disallow():
    """RFC 9309 §2.2.2: on equivalent matches the least-restrictive
    (Allow) rule wins, even when Disallow is listed first."""
    txt = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    m = RobotsMatcher(txt)
    assert m.allowed("/page")
    # and the reverse order too
    m2 = RobotsMatcher("User-agent: *\nAllow: /page\nDisallow: /page\n")
    assert m2.allowed("/page")
    # longer Disallow still beats shorter Allow
    m3 = RobotsMatcher("User-agent: *\nAllow: /page\nDisallow: /page/sub\n")
    assert not m3.allowed("/page/sub/x")
