"""IcebergLite — snapshot-isolated parquet tables with manifest files.

The sandbox has no Iceberg runtime jar (SURVEY.md §7), so this thin
catalog provides the subset of Iceberg semantics the engine's
checkpoint/resume contract needs, honestly labeled:

  table_dir/
    data/s{snapshot_id:08d}/part-*.parquet   -- immutable data files
    metadata/v{snapshot_id}.json             -- file list + parent + ts
    metadata/current                         -- committed snapshot id

Commits are atomic: data + manifest are fully written before
``current`` flips via os.replace. ``read(at=snapshot_id)`` is time
travel; ``rollback`` rewinds ``current``. The real Iceberg catalog
drops in behind the same TableIO surface (append / read / snapshot /
rollback) when the runtime jar is available.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


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

    def _manifest(self, snapshot_id: int) -> dict:
        with open(os.path.join(self.meta_dir, f"v{snapshot_id}.json")) as f:
            return json.load(f)

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
        prev_files = self._manifest(parent)["files"] if parent else []
        manifest = {
            "snapshot_id": snap,
            "parent": parent,
            "ts": time.time(),
            "files": prev_files + files,
            "added": files,
            "schema_ddl": df.schema.simpleString(),
        }
        tmp = os.path.join(self.meta_dir, f".v{snap}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
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
        manifest = {
            "snapshot_id": snap,
            "parent": parent,
            "ts": time.time(),
            "files": files,
            "added": files,
            "schema_ddl": df.schema.simpleString(),
        }
        tmp = os.path.join(self.meta_dir, f".v{snap}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
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

    # ----------------------------------------------------------- read

    def read(self, spark: SparkSession, at: int | None = None) -> DataFrame | None:
        snap = at if at is not None else self.current_snapshot()
        if snap is None:
            return None
        files = self._manifest(snap)["files"]
        if not files:
            return None
        return spark.read.parquet(*files)
