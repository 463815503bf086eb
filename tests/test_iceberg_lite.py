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
        # a commit after rollback allocates a FRESH id: the abandoned
        # timeline's snapshot stays readable (time-travel contract)
        s3 = t.append(spark.range(0, 3).selectExpr("id as x"))
        assert s3 == 3 and t.read(spark).count() == 13
        assert t.read(spark, at=s2).count() == 15


def test_overwrite_snapshot(spark):
    with tempfile.TemporaryDirectory() as d:
        t = IcebergLiteTable(d + "/t")
        t.append(spark.range(0, 10).selectExpr("id as x"))
        t.overwrite(spark.range(0, 4).selectExpr("id as x"))
        assert t.read(spark).count() == 4
        assert t.read(spark, at=1).count() == 10


import pytest


@pytest.fixture(params=["iceberg_lite"])
def table_io(request, tmp_path):
    """TableIO contract surface: append / overwrite / read / snapshots /
    current_snapshot / rollback. Parametrized so a real Iceberg catalog
    (when the runtime jar is present) can drop in behind the same
    surface — SURVEY.md §7 environment fallback."""
    if request.param == "iceberg_lite":
        return IcebergLiteTable(str(tmp_path / "t"))
    pytest.skip(f"{request.param} backend not available in this environment")


def test_table_io_contract(spark, table_io):
    t = table_io
    # empty table reads as None, no current snapshot
    assert t.read(spark) is None and t.current_snapshot() is None
    # append is atomic + monotonic
    s1 = t.append(spark.range(0, 5).selectExpr("id as x"))
    s2 = t.append(spark.range(5, 8).selectExpr("id as x"))
    assert s2 > s1 and t.current_snapshot() == s2
    assert t.read(spark).count() == 8
    # time travel: every snapshot id in snapshots() is readable
    assert t.snapshots() == [s1, s2]
    assert t.read(spark, at=s1).count() == 5
    # rollback is a pure pointer move; later commits never clobber ids
    t.rollback(s1)
    s3 = t.overwrite(spark.range(0, 2).selectExpr("id as x"))
    assert s3 not in (s1, s2)
    assert t.read(spark, at=s2).count() == 8
    assert t.read(spark).count() == 2
