import tempfile

from fundcrawler_spark.sources.iceberg_lite import IcebergLiteTable


def test_append_time_travel_rollback(spark):
    with tempfile.TemporaryDirectory() as d:
        t = IcebergLiteTable(d + "/t")
        assert t.read(spark) is None
        s1 = t.append(spark.range(0, 10).selectExpr("id as x"))
        s2 = t.append(spark.range(10, 15).selectExpr("id as x"))
        assert (s1, s2) == (1, 2)
        assert t.read(spark).count() == 15
        assert t.read(spark, at=s1).count() == 10  # time travel
        t.rollback(s1)
        assert t.current_snapshot() == s1
        assert t.read(spark).count() == 10
        s3 = t.append(spark.range(0, 3).selectExpr("id as x"))
        assert s3 == 2 and t.read(spark).count() == 13


def test_overwrite_snapshot(spark):
    with tempfile.TemporaryDirectory() as d:
        t = IcebergLiteTable(d + "/t")
        t.append(spark.range(0, 10).selectExpr("id as x"))
        t.overwrite(spark.range(0, 4).selectExpr("id as x"))
        assert t.read(spark).count() == 4
        assert t.read(spark, at=1).count() == 10
