"""CSV sink/scan roundtrip with the reference's Chinese headers and
'None' null convention."""

import shutil
import tempfile

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.operators.assemble import assemble_results
from fundcrawler_spark.schemas import CSV_HEADERS, PAGE_BODIES_SCHEMA, SEEDS_SCHEMA
from fundcrawler_spark.sources.sinks import read_result_csv, write_result_csv


def test_csv_roundtrip(spark):
    seeds = spark.createDataFrame(fx.seed_rows(20), SEEDS_SCHEMA)
    codes = [r[0] for r in fx.seed_rows(20)]
    bodies = spark.createDataFrame(fx.page_body_rows(codes), PAGE_BODIES_SCHEMA)
    fetched = bodies.join(seeds, "fund_code").select(
        "seed_index", "fund_code", "page_type", "body"
    )
    res = assemble_results(fetched, seeds)
    d = tempfile.mkdtemp(prefix="csv_")
    try:
        write_result_csv(res, d + "/out")
        raw = spark.read.option("header", True).csv(d + "/out")
        assert set(raw.columns) == set(CSV_HEADERS.values())  # 基金代码 etc.
        # sentinel funds render as the literal 'None'
        missing = [c for c in codes if fx.expected_fields(c)["sharpe_3y"] is None]
        got = {r[CSV_HEADERS["fund_code"]]: r for r in raw.collect()}
        for c in missing:
            assert got[c][CSV_HEADERS["sharpe_3y"]] == "None"
        back = read_result_csv(spark, d + "/out")
        assert {r["fund_code"]: r["sharpe_3y"] for r in back.collect()}[missing[0]] is None
    finally:
        shutil.rmtree(d)
