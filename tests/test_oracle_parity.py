"""In-suite oracle parity: a fast subset of the queries()/oracle_sql()
contract at sf0.001 (the full 33-query sweep at sf0.01 lives in
scripts/check_parity.py). Mirrors the driver: row count, column names,
order-insensitive value hash."""

import duckdb
import pandas as pd
import pytest

from fundcrawler_spark.entry_queries import QUERIES, resolve_oracle

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FAST = [
    "analysis_topk",
    "regex_overview",
    "regex_metrics_sentinel",
    "regex_increase_sentinel",
    "seed_scan_slices",
    "barrier_pivot",
    "sliding_failrate",
    "retry_priority_admission",
    "anti_join_seen",
    "union_frontier",
    "date_math_tenure",
    "aimd_step_math",
    "json_result",
    "events_user_window",
    "dedup_exact",
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "simhash",
    "simhash_pairs",
    "phash_near_dup_pairs",
    "images_enrich",
    "images_resize",
    "video_frame_sample",
    "audio_features",
    "crossmodal_dedup_groups",
    "neardup_jaccard",
    "embedding_topk",
    "embedding_neardup",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(
        tuple("NULL" if pd.isna(v) else repr(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, con, name):
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF).toPandas()
    odf = con.execute(resolve_oracle(sql)).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert _norm(sdf) == _norm(odf)


# ---- full sweep (r6 verdict item 7): every registered query vs its
# oracle at sf0.01 — the exact protocol scripts/check_parity.py runs,
# now an in-repo gate so a regression in the non-FAST queries can't
# land silently. Marked full_parity (slow): run with
#   pytest -m full_parity tests/test_oracle_parity.py
SF_FULL = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con_full():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_FULL}/{t}.parquet'")
    return c


@pytest.mark.full_parity
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_full_parity_sf001(spark, con_full, name):
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_FULL).toPandas()
    odf = con_full.execute(resolve_oracle(sql)).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert _norm(sdf) == _norm(odf)
