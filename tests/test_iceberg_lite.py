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


def _ranged_table(spark, d, n_batches=8, rows=100):
    """Each append holds a disjoint id range -> per-file min/max are
    tight and pruning is provable."""
    t = IcebergLiteTable(d + "/t")
    for b in range(n_batches):
        t.append(
            spark.range(b * rows, (b + 1) * rows).selectExpr(
                "id AS x",
                "CAST(id AS DOUBLE) / 10 AS score",
                "concat('host', lpad(CAST(id % 5 AS STRING), 2, '0')) AS host",
            )
        )
    return t


def test_scan_prunes_files_by_manifest_stats(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d)
        # equality inside one batch's range -> exactly that batch's files
        kept, total = t.plan_scan([("x", "==", 250)])
        assert total > kept.__len__() >= 1
        assert all("/data/s" in f for f in kept)
        # every kept file really spans 250
        stats = t._manifest(t.current_snapshot())["stats"]
        for f in kept:
            assert stats[f]["x"]["min"] <= 250 <= stats[f]["x"]["max"]
        # range predicate prunes the low batches
        kept_hi, _ = t.plan_scan([("x", ">=", 700)])
        assert len(kept_hi) < total
        # the pruned scan result == unpruned filter result
        got = sorted(
            r["x"] for r in t.scan(spark, [("x", ">=", 700)]).collect()
        )
        want = sorted(
            r["x"] for r in t.read(spark).filter("x >= 700").collect()
        )
        assert got == want and len(got) == 100


def test_scan_residual_filter_is_exact(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d)
        # file-level stats cannot decide x == 250 alone (the file
        # spans 200..299): residual filter must cut it to one row
        out = t.scan(spark, [("x", "==", 250), ("score", "<=", 25.0)])
        assert [r["x"] for r in out.collect()] == [250]


def test_scan_string_stats_and_unprunable_columns(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d)
        kept, total = t.plan_scan([("host", "==", "host04")])
        # every file holds host00..host04 -> strings prunable but
        # nothing pruned (correctly)
        assert len(kept) == total
        got = t.scan(spark, [("host", "==", "host99")]).count()
        assert got == 0


def test_scan_all_pruned_returns_empty_with_schema(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d, n_batches=2)
        df = t.scan(spark, [("x", ">=", 10_000)])
        assert df.count() == 0
        assert set(df.columns) == {"x", "score", "host"}


def test_scan_time_travel_and_missing_stats_keep_file(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d, n_batches=4)
        s2 = 2
        kept, total = t.plan_scan([("x", ">=", 150)], at=s2)
        assert total == sum(1 for _ in t._manifest(s2)["files"])
        # unknown column -> never prunes, scan still correct
        kept2, total2 = t.plan_scan([("nope_col", ">=", 150)])
        assert len(kept2) == total2
        assert t.scan(spark, [], at=s2).count() == 200


def test_scan_prunes_all_null_column_files(spark):
    with tempfile.TemporaryDirectory() as d:
        t = IcebergLiteTable(d + "/t")
        t.append(spark.range(0, 50).selectExpr("id AS x", "CAST(NULL AS BIGINT) AS y"))
        t.append(spark.range(50, 100).selectExpr("id AS x", "id AS y"))
        kept, total = t.plan_scan([("y", ">=", 0)])
        n_batch1 = len(t._manifest(1)["files"])
        assert len(kept) == total - n_batch1  # all-null files pruned
        stats = t._manifest(t.current_snapshot())["stats"]
        assert all(stats[f]["y"]["min"] is not None for f in kept)
        assert t.scan(spark, [("y", ">=", 0)]).count() == 50


def test_compact_rewrites_small_files_same_rows(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d, n_batches=8, rows=50)
        before = t._manifest(t.current_snapshot())["files"]
        pre = sorted(r["x"] for r in t.read(spark).collect())
        s = t.compact(spark, target_rows=10_000)  # -> 1 file
        m = t._manifest(s)
        assert len(m["files"]) < len(before)
        assert sorted(r["x"] for r in t.read(spark).collect()) == pre
        # compacted files get fresh manifest stats (pruning still works)
        kept, total = t.plan_scan([("x", ">=", 10_000)])
        assert kept == []
        # pre-compaction snapshot still time-travels
        assert t.read(spark, at=s - 1).count() == len(pre)


def test_expire_snapshots_deletes_only_dead_files(spark):
    import os

    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d, n_batches=4, rows=50)
        t.compact(spark, target_rows=10_000)
        live_before = t._manifest(t.current_snapshot())["files"]
        res = t.expire_snapshots(keep_last=1)
        assert len(res["expired"]) == 4
        assert res["deleted_files"] > 0
        # current snapshot fully intact
        assert all(os.path.exists(f) for f in live_before)
        assert t.read(spark).count() == 200
        assert t.snapshots() == [t.current_snapshot()]
        # idempotent
        assert t.expire_snapshots(keep_last=1) == {
            "expired": [], "deleted_files": 0
        }


def test_expire_keeps_current_after_rollback(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d, n_batches=3, rows=20)
        t.rollback(2)
        res = t.expire_snapshots(keep_last=1)
        # current (2) is kept even though it is not the last snapshot
        assert 2 not in res["expired"]
        assert t.read(spark).count() == 40
        # snapshot 1's files are shared with 2 (append lineage) -> the
        # shared ones must survive; full read still works
        assert t.read(spark, at=t.current_snapshot()).count() == 40


def test_read_incremental_returns_only_delta(spark):
    with tempfile.TemporaryDirectory() as d:
        t = IcebergLiteTable(d + "/t")
        s1 = t.append(spark.range(0, 10).selectExpr("id AS x"))
        s2 = t.append(spark.range(10, 15).selectExpr("id AS x"))
        s3 = t.append(spark.range(15, 18).selectExpr("id AS x"))
        got = sorted(r["x"] for r in t.read_incremental(spark, since=s1).collect())
        assert got == list(range(10, 18))
        got2 = sorted(
            r["x"] for r in t.read_incremental(spark, since=s1, to=s2).collect()
        )
        assert got2 == list(range(10, 15))
        # since current -> no delta
        assert t.read_incremental(spark, since=s3) is None
        # since=0 -> everything
        assert t.read_incremental(spark, since=0).count() == 18


def test_read_incremental_rejects_non_ancestor_and_overwrite(spark):
    import pytest as _pytest

    with tempfile.TemporaryDirectory() as d:
        t = IcebergLiteTable(d + "/t")
        s1 = t.append(spark.range(0, 5).selectExpr("id AS x"))
        t.rollback(s1)  # no-op branch point
        s2 = t.append(spark.range(5, 9).selectExpr("id AS x"))
        t.rollback(s1)
        s3 = t.append(spark.range(9, 12).selectExpr("id AS x"))
        # s2 lives on the abandoned timeline: not an ancestor of s3
        with _pytest.raises(ValueError, match="not an ancestor"):
            t.read_incremental(spark, since=s2, to=s3)
        # a compaction (overwrite) inside the range is rejected
        t.compact(spark, target_rows=10_000)
        with _pytest.raises(ValueError, match="incremental append scan"):
            t.read_incremental(spark, since=s1)


def test_incremental_corpus_refresh_equals_full_minus_seen(spark):
    """The corpus-job pattern: build at snapshot k, later refresh with
    read_incremental(since=k) — the union of the two deltas covers
    every page exactly once."""
    with tempfile.TemporaryDirectory() as d:
        t = IcebergLiteTable(d + "/t")
        t.append(spark.range(0, 30).selectExpr("id AS x"))
        k = t.current_snapshot()
        first = {r["x"] for r in t.read(spark).collect()}
        t.append(spark.range(30, 50).selectExpr("id AS x"))
        t.append(spark.range(50, 55).selectExpr("id AS x"))
        delta = {r["x"] for r in t.read_incremental(spark, since=k).collect()}
        assert first | delta == set(range(55))
        assert first & delta == set()


def test_scan_type_mismatched_predicate_never_prunes(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _ranged_table(spark, d, n_batches=2)
        # int predicate against the string column: planning must keep
        # every file (and Spark's own cast semantics decide the rows)
        kept, total = t.plan_scan([("host", ">=", 5)])
        assert len(kept) == total


def test_maintain_tables_sweep(spark):
    from fundcrawler_spark.sources.iceberg_lite import maintain_tables

    with tempfile.TemporaryDirectory() as d:
        t1 = IcebergLiteTable(d + "/pages")
        for b in range(5):
            t1.append(spark.range(b * 20, (b + 1) * 20).selectExpr("id AS x"))
        t2 = IcebergLiteTable(d + "/images")  # stays empty
        rep = maintain_tables(spark, [t1, t2], expire_keep=1)
        assert rep["images"]["skipped"] == "empty"
        r1 = rep["pages"]
        assert r1["files_after"] < r1["files_before"]
        assert len(r1["expired"]["expired"]) == 5
        assert t1.read(spark).count() == 100
        assert t1.snapshots() == [t1.current_snapshot()]


def test_maintain_tables_zorder_option(spark):
    """zorder={'pages': (u, v)} routes that table through Z-clustered
    compaction (row set unchanged, 2D predicate prunes); unlisted
    tables still bin-pack."""
    from fundcrawler_spark.sources.iceberg_lite import maintain_tables

    with tempfile.TemporaryDirectory() as d:
        t1 = IcebergLiteTable(d + "/pages")
        rows = spark.createDataFrame(
            [(i, i % 64, (i * 29) % 64) for i in range(2048)],
            "id long, seed_index long, wave long",
        )
        t1.append(rows.repartition(8))
        t2 = IcebergLiteTable(d + "/logs")
        t2.append(spark.range(0, 50).selectExpr("id AS x"))
        rep = maintain_tables(
            spark, [t1, t2], target_rows=256,
            zorder={"pages": ("seed_index", "wave")},
        )
        assert rep["logs"]["files_after"] >= 1
        assert t1.read(spark).count() == 2048
        pred = [("seed_index", ">=", 16), ("seed_index", "<=", 23),
                ("wave", ">=", 16), ("wave", "<=", 23)]
        kept, total = t1.plan_scan(pred)
        assert total == 8 and len(kept) < total
        got = sorted(r["id"] for r in t1.scan(spark, pred).collect())
        want = sorted(
            i for i in range(2048)
            if 16 <= i % 64 <= 23 and 16 <= (i * 29) % 64 <= 23
        )
        assert got == want


def test_plan_scan_spark_path_matches_python_path(spark, tmp_path):
    # r7 (verdict item 4): the distributed manifest prune must make the
    # same keep/drop decisions as the driver pyarrow loop
    import random

    from fundcrawler_spark.sources.iceberg_lite import (
        IcebergLiteTable,
        _write_manifest_parquet,
    )

    random.seed(3)
    entries = {}
    for i in range(400):
        lo = random.randint(0, 900)
        entries[f"/fake/f{i:05d}.parquet"] = {
            "x": {"min": lo, "max": lo + random.randint(0, 120),
                  "null_count": 0, "rows": 100},
            "host": {"min": f"h{lo % 7}", "max": f"h{lo % 7 + 2}",
                     "null_count": 3, "rows": 100},
            "allnull": {"min": None, "max": None,
                        "null_count": 100, "rows": 100},
        }
    t = IcebergLiteTable(str(tmp_path / "t"))
    mpath = str(tmp_path / "t" / "metadata" / "m1.parquet")
    _write_manifest_parquet(mpath, entries)
    import json
    import os

    with open(os.path.join(t.meta_dir, "v1.json"), "w") as f:
        json.dump({"snapshot_id": 1, "parent": None, "ts": 0,
                   "added": sorted(entries), "manifests": [mpath],
                   "schema_ddl": "x int"}, f)
    t._set_current(1)

    for pred in (
        [("x", ">=", 700)],
        [("x", "==", 250)],
        [("x", "<", 100), ("host", "==", "h3")],
        [("allnull", ">=", 0)],
        [("missing_col", "==", 1)],
        [("x", "==", "type-mismatch")],
    ):
        py_kept, py_total = t.plan_scan(pred, spark=None)
        sp_kept, sp_total = t._plan_scan_spark(spark, [mpath], pred)
        assert py_total == sp_total == 400
        assert sorted(py_kept) == sorted(sp_kept), pred


def test_plan_scan_100k_files_without_ofiles_json(spark, tmp_path):
    # a 10^5-entry synthetic manifest plans through the Spark path: the
    # snapshot JSON stays O(commits) tiny and the driver receives only
    # the surviving paths
    import json
    import os

    from fundcrawler_spark.sources.iceberg_lite import (
        IcebergLiteTable,
        _write_manifest_parquet,
    )

    n = 100_000
    entries = {
        f"/fake/g{i:06d}.parquet": {
            "x": {"min": i * 10, "max": i * 10 + 9,
                  "null_count": 0, "rows": 1000},
        }
        for i in range(n)
    }
    t = IcebergLiteTable(str(tmp_path / "big"))
    mpath = str(tmp_path / "big" / "metadata" / "m1.parquet")
    _write_manifest_parquet(mpath, entries)
    with open(os.path.join(t.meta_dir, "v1.json"), "w") as f:
        json.dump({"snapshot_id": 1, "parent": None, "ts": 0,
                   "added": [], "manifests": [mpath],
                   "schema_ddl": "x int"}, f)
    t._set_current(1)

    assert os.path.getsize(os.path.join(t.meta_dir, "v1.json")) < 4096
    kept, total = t.plan_scan([("x", ">=", 999_900)], spark=spark)
    assert total == n
    # x >= 999900 -> files with max >= 999900 -> i*10+9 >= 999900
    want = sorted(
        f"/fake/g{i:06d}.parquet" for i in range(n) if i * 10 + 9 >= 999_900
    )
    assert sorted(kept) == want
