from pyspark.sql import functions as F

from fundcrawler_spark.functions.urlnorm import (
    build_url,
    canonicalize_url,
    url_hash,
    url_host,
)

CASES = [
    ("HTTP://WWW.Example.COM:80//a//b/?q=1#frag", "http://example.com/a/b?q=1"),
    ("https://fundf10.eastmoney.com/jbgk_000001.html", "http://fundf10.eastmoney.com/jbgk_000001.html"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/path/", "http://example.com/path"),
    ("https://a.b:443/x", "http://a.b/x"),
]


def test_canonicalize(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    out = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert out == [e for _, e in CASES]


def test_build_url_matches_reference_templates(spark):
    df = spark.createDataFrame(
        [("000001", p) for p in ("OVERVIEW", "MANAGER", "METRICS", "INCREASE")],
        "fund_code string, page_type string",
    )
    got = {
        r["page_type"]: r["u"]
        for r in df.select(
            "page_type", build_url(F.col("page_type"), F.col("fund_code")).alias("u")
        ).collect()
    }
    # reference templates: impl/overview.py:16, manager.py:15, sharpe.py:13,
    # increase.py:16
    assert got["OVERVIEW"] == "http://fundf10.eastmoney.com/jbgk_000001.html"
    assert got["MANAGER"] == "http://fundf10.eastmoney.com/jjjl_000001.html"
    assert got["METRICS"] == "http://fundf10.eastmoney.com/tsdata_000001.html"
    assert got["INCREASE"].endswith("type=jdzf&code=000001")


def test_host_and_hash_stable(spark):
    df = spark.createDataFrame([("http://h.example/x",)], "url_norm string")
    row = df.select(
        url_host(F.col("url_norm")).alias("h"), url_hash(F.col("url_norm")).alias("k")
    ).first()
    assert row["h"] == "h.example"
    row2 = df.select(url_hash(F.col("url_norm")).alias("k")).first()
    assert row["k"] == row2["k"]
