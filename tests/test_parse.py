"""Parse-layer conformance: the regexp Column trees must reproduce the
reference strategies' extraction on synthetic bodies embedding the exact
regex targets (reference impl/{overview,manager,sharpe,increase}.py),
including '--'/'---' sentinels and thousands separators."""

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.operators.assemble import assemble_results, to_csv_compat
from fundcrawler_spark.schemas import PAGE_BODIES_SCHEMA, SEEDS_SCHEMA


def _fetched(spark, n):
    seeds = spark.createDataFrame(fx.seed_rows(n), SEEDS_SCHEMA)
    codes = [r[0] for r in fx.seed_rows(n)]
    bodies = spark.createDataFrame(fx.page_body_rows(codes), PAGE_BODIES_SCHEMA)
    return seeds, bodies.join(seeds, "fund_code").select(
        "seed_index", "fund_code", "page_type", "body"
    )


def test_all_fields_match_ground_truth(spark):
    seeds, fetched = _fetched(spark, 60)
    rows = {r["fund_code"]: r.asDict() for r in assemble_results(fetched, seeds).collect()}
    assert len(rows) == 60
    for code, row in rows.items():
        exp = fx.expected_fields(code)
        for k, v in exp.items():
            if k.startswith("_"):
                continue
            assert row[k] == v, (code, k, row[k], v)


def test_sentinels_become_null_and_csv_none(spark):
    seeds, fetched = _fetched(spark, 60)
    res = assemble_results(fetched, seeds)
    codes = [r[0] for r in fx.seed_rows(60)]
    with_missing = [c for c in codes if fx.expected_fields(c)["sharpe_3y"] is None]
    assert with_missing, "fixture must include '--' sentinel funds"
    got = {r["fund_code"]: r for r in res.collect()}
    for c in with_missing:
        assert got[c]["sharpe_3y"] is None
    csv = {r["fund_code"]: r for r in to_csv_compat(res).collect()}
    for c in with_missing:
        assert csv[c]["sharpe_3y"] == "None"  # save_result_2_file.py:28-29


def test_incomplete_context_dropped(spark):
    seeds, fetched = _fetched(spark, 10)
    codes = [r[0] for r in fx.seed_rows(10)]
    partial = fetched.filter(
        ~((fetched.fund_code == codes[0]) & (fetched.page_type == "MANAGER"))
    )
    out = assemble_results(partial, seeds)
    got = {r["fund_code"] for r in out.collect()}
    assert codes[0] not in got and len(got) == 9
