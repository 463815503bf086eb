"""Construction-time config guards (r5 ADVICE medium): invalid
seen-set / insert-mode combinations must fail loudly at CrawlConfig
init, never silently corrupt the bloom at settle time."""

import pytest

from fundcrawler_spark.plans.wave_loop import CrawlConfig


def test_admission_insert_requires_cuckoo():
    with pytest.raises(ValueError, match="cuckoo"):
        CrawlConfig(insert_on="admission", seen_kind="bloom")
    # the valid combination constructs fine
    CrawlConfig(insert_on="admission", seen_kind="cuckoo")


def test_unknown_enum_values_rejected():
    with pytest.raises(ValueError, match="seen_kind"):
        CrawlConfig(seen_kind="hyperloglog")
    with pytest.raises(ValueError, match="insert_on"):
        CrawlConfig(insert_on="never")


def test_fetch_order_requires_ranks(spark):
    """with_fetch_order must raise on unranked input instead of
    silently producing a nondeterministic order (r5 ADVICE low)."""
    from fundcrawler_spark.operators.fetch import with_fetch_order

    df = spark.createDataFrame([("u1", "h1")], "url_hash string, host string")
    with pytest.raises(ValueError, match="host_rank"):
        with_fetch_order(df, {"h1": 1}, 0)
