"""Driver-contract smoke: entry() produces rows at sf0.001; every
oracle key has a query; plan-shape audits (pushdown, broadcast)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"category", "rank", "fund_code"} <= set(df.columns)


def test_queries_oracles_aligned():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


def test_anti_join_is_broadcast(spark):
    from fundcrawler_spark.entry_queries import QUERIES

    fn, _ = QUERIES["anti_join_seen"]
    plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_parquet_scan_prunes_columns(spark):
    from fundcrawler_spark.entry_queries import QUERIES

    fn, _ = QUERIES["seed_scan_slices"]
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # only c_custkey + c_name should be read from the customer scan
    assert "c_custkey" in plan and "c_acctbal" not in plan


def test_flagship_stays_codegen(spark):
    df = entry_mod.entry(spark)
    df.collect()  # AQE finalizes the physical plan only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen stages in the compact form;
    # WindowGroupLimit = rank-limit pushdown below the top-K windows
    assert "*(" in plan, plan[:2000]
    assert "WindowGroupLimit" in plan


def test_parallelism_repartitions_are_hash_keyed(spark):
    """Plan guard for the r7 repartition-key change: the
    spread-for-parallel-map exchanges hash a unique row key instead of
    round-robin, because every keyless repartition(n) first sorts its
    input locally (spark.sql.execution.sortBeforeRepartition) — pure
    overhead on these paths. A RoundRobinPartitioning reappearing in a
    headline plan means the pre-sort snuck back in."""
    from fundcrawler_spark.entry_queries import QUERIES

    for name, key in [
        ("retry_priority_admission", "uid"),
        ("regex_overview", "o_orderkey"),
        ("quality_score", "doc_id"),
        ("seen_cardinality", "l_returnflag"),
    ]:
        fn, _ = QUERIES[name]
        plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" not in plan, name
        assert f"hashpartitioning({key}" in plan, (name, plan[:2000])


def test_neardup_and_similarity_plans_never_cartesian(spark):
    """Scale guard: the LSH/near-dup pipelines must candidate-generate
    via equi-joins on band/bucket/cell keys — a CartesianProduct (or
    non-broadcast nested loop) anywhere means the O(n^2) path snuck
    back in."""
    from fundcrawler_spark.entry_queries import QUERIES

    for name in ("neardup_jaccard", "embedding_neardup", "embedding_ann_lsh",
                 "embedding_ann_ivf", "dedup_groups"):
        fn, _ = QUERIES[name]
        plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        # BroadcastNestedLoopJoin is acceptable only for the tiny
        # broadcast query side; reject it on the self-join paths
        if name in ("neardup_jaccard", "embedding_neardup", "dedup_groups"):
            assert "NestedLoop" not in plan, name


def test_refill_dedup_plan_is_broadcast(spark):
    """Scale guard for the discover-mode refill dedup: the anti-join of
    moved backlog rows vs the bounded active keys must be a broadcast
    hash join (the moved side may be arbitrarily large at refill); a
    SortMergeJoin here would shuffle backlog-sized data per refill."""
    from pyspark.sql import functions as F

    from fundcrawler_spark.operators.seen import SeenSet
    from fundcrawler_spark.plans.wave_loop import dedup_backlog_rows

    seen = SeenSet(spark, n_shards=4)
    moved = spark.range(10_000).select(
        F.col("id").cast("long").alias("url_hash"), F.lit("h").alias("host")
    )
    active = spark.range(100).select(
        F.col("id").cast("long").alias("url_hash"), F.lit("h").alias("host")
    )
    out = dedup_backlog_rows(seen, seen.empty_shards(), moved, active)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]


def test_frozen_bpe_fixture_reproduced():
    """The committed frozen BPE counts (the oracle's independent side
    for token_count_bpe) must reproduce from the pure-Python tokenizer
    in scripts/freeze_bpe.py. If this fails, the tokenizer spec drifted
    on one side: fix the regression, or for a DELIBERATE spec change
    regenerate via scripts/freeze_bpe.py and commit."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from freeze_bpe import compute_entries

    from fundcrawler_spark.frozen_bpe import FROZEN_BPE_COUNTS

    assert compute_entries() == FROZEN_BPE_COUNTS


def test_priority_scores_reorder_admission(spark):
    """with_priority_scores + admit: higher-scored seeds win the
    budget, retry-first still dominates everything."""
    from pyspark.sql import functions as F

    from fundcrawler_spark.fixtures import seed_rows
    from fundcrawler_spark.operators.frontier import (
        seeds_to_frontier,
        with_priority_scores,
    )
    from fundcrawler_spark.operators.politeness import admit

    seeds = spark.createDataFrame(
        seed_rows(6), "fund_code string, fund_name string, seed_index long"
    )
    frontier = seeds_to_frontier(seeds)
    host = frontier.select("host").first()["host"]

    # seed 5 outranks everyone; seed 0 (the FIFO winner) scores lowest
    scores = spark.createDataFrame(
        [(i, (i + 1) * 1000) for i in range(6)], "seed_index long, rank long"
    )
    prio = with_priority_scores(frontier, scores)

    got = admit(prio, {host: 4}, max_budget=4).select(
        "seed_index", "page_type"
    ).collect()
    assert {r["seed_index"] for r in got} == {5}  # all 4 pages of top seed

    # a retry row from the lowest-scored seed still preempts
    retry = prio.withColumn(
        "retry_count",
        F.when(F.col("seed_index") == 0, F.lit(1)).otherwise(F.lit(0)).cast("int"),
    )
    got2 = admit(retry, {host: 4}, max_budget=4).collect()
    assert {r["seed_index"] for r in got2} == {0}

    # unscored rows fall back AFTER scored ones
    part = with_priority_scores(frontier, scores.filter("seed_index = 3"))
    got3 = admit(part, {host: 4}, max_budget=4).collect()
    assert {r["seed_index"] for r in got3} == {3}
