"""Scale-safe exact per-group quantiles (operators/quantiles.py):
bit-exact vs the F.percentile aggregate, with no per-group single
reducer in the plan (r6 verdict item 2)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fundcrawler_spark.operators.quantiles import exact_group_quantiles

QS = [0.5, 0.95, 0.99]
NAMES = ["p50", "p95", "p99"]


def _reference(df):
    return {
        r["g"]: (r["n"], r["p50"], r["p95"], r["p99"])
        for r in df.groupBy(F.col("t").alias("g"))
        .agg(
            F.count("*").alias("n"),
            *[
                F.percentile(F.col("v"), F.lit(q)).alias(nm)
                for q, nm in zip(QS, NAMES)
            ],
        )
        .collect()
    }


def _got(df):
    return {
        r["t"]: (r["n"], r["p50"], r["p95"], r["p99"])
        for r in exact_group_quantiles(df, "t", "v", QS, NAMES).collect()
    }


def test_bit_exact_vs_percentile_aggregate(spark):
    random.seed(11)
    rows = [
        (random.choice(["click", "view", "buy", "nav", "err"]),
         random.random() * 1000 - 200)
        for _ in range(20011)
    ]
    df = spark.createDataFrame(rows, "t string, v double")
    assert _got(df) == _reference(df)


def test_duplicates_small_groups_and_nulls(spark):
    rows = (
        [("a", 1.0)] * 50                      # all-equal values
        + [("b", float(i)) for i in range(3)]  # tiny group
        + [("c", 7.5)]                          # singleton
        + [("d", None)] * 4                     # all-null values
        + [("e", None), ("e", 2.0), ("e", 4.0)]  # mixed nulls
    )
    df = spark.createDataFrame(rows, "t string, v double")
    got, want = _got(df), _reference(df)
    assert got == want
    assert got["d"][0] == 4 and got["d"][1] is None


def test_plan_has_no_percentile_and_even_sort(spark):
    rows = [(str(i % 3), float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "t string, v double")
    # the operator runs its jobs inside the call; inspect the ranged
    # pass it builds: range-partition + within-partition sort only
    ranged = (
        df.select(F.col("t").alias("g"), F.col("v"))
        .filter(F.col("v").isNotNull())
        .repartitionByRange(8, F.col("g"), F.col("v"))
        .sortWithinPartitions("g", "v")
    )
    plan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan
    # and the full operator output must not be produced by a
    # percentile aggregate anywhere (it is a local relation assembled
    # from bounded picks)
    out = exact_group_quantiles(df, "t", "v", QS, NAMES)
    out_plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in out_plan.lower()
