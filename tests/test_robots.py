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
