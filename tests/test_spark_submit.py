"""North-rule deployment contract: the engine runs via
``spark-submit --py-files dist/fundcrawler_spark.zip`` (BASELINE.json).
This test builds the zip, launches a real spark-submit subprocess from a
NEUTRAL cwd (imports must resolve from the --py-files zip, not the repo
checkout), runs a small crawl end-to-end, and checks the stats line."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_crawl(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not on PATH")

    zpath = tmp_path / "fundcrawler_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "fundcrawler_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))

    wd = tmp_path / "crawlwd"
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            os.path.join(REPO, "jobs", "crawl_job.py"),
            "--workdir", str(wd),
            "--seeds", "4",
            "--max-waves", "8",
            "--init-budget", "160",
            "--compact",
            "--zorder-pages",
            "--expire-keep", "1",
        ],
        capture_output=True, text=True, timeout=570, cwd=str(tmp_path),
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    stats_lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert stats_lines, out.stdout[-1000:]
    stats = json.loads(stats_lines[-1])
    assert stats["pages_fetched"] == 16  # 4 seeds x 4 page types
    assert stats["results"] == 4
    # the maintenance sweep ran, z-clustered the pages table, and the
    # rewritten table still holds every page row
    rep = stats["maintenance"]["pages"]
    assert rep["files_after"] <= rep["files_before"]
    assert rep["expired"]["expired"]  # expire-keep dropped old snapshots
