"""grouped_topk must equal the naive single-window top-K exactly."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from fundcrawler_spark.operators.topk import grouped_topk


def test_salted_topk_equals_naive(spark):
    df = (
        spark.range(0, 5000)
        .withColumn("g", (F.col("id") % 7).cast("string"))
        .withColumn("v", F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double"))
    )
    got = grouped_topk(df, ["g"], ["v"], 25, tiebreak=["id"])
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    naive = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 25)
    a = sorted(map(tuple, got.select("g", "rank", "id", "v").collect()))
    b = sorted(map(tuple, naive.select("g", "rank", "id", "v").collect()))
    assert a == b and len(a) == 7 * 25


def test_small_group_under_k(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double") \
        .withColumn("id", F.monotonically_increasing_id())
    out = grouped_topk(df, ["g"], ["v"], 10, tiebreak=["id"])
    assert out.count() == 2


def test_unsalted_plan_is_rank_identical(spark):
    """salted=False is a physical-plan choice only: identical ranks."""
    from pyspark.sql import functions as F

    from fundcrawler_spark.operators.topk import grouped_topk

    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 2654435761 % 1000).alias("score"),
        F.col("id").alias("tid"),
    )
    a = grouped_topk(df, ["g"], [F.col("score").desc()], 10, tiebreak=["tid"])
    b = grouped_topk(df, ["g"], [F.col("score").desc()], 10, tiebreak=["tid"],
                     salted=False)
    ka = sorted((r["g"], r["rank"], r["tid"]) for r in a.collect())
    kb = sorted((r["g"], r["rank"], r["tid"]) for r in b.collect())
    assert ka == kb
