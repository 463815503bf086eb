"""Stateful streaming AIMD: the applyInPandasWithState operator must
produce exactly the budgets a driver-side HostRate replay produces for
the same per-wave counts (shared formula, two execution surfaces)."""

import shutil
import tempfile
import time

from fundcrawler_spark.plans.rate_control import HostRate
from fundcrawler_spark.streaming.stateful_rate import run_budget_stream


def test_streaming_budgets_match_hostrate_replay(spark):
    d = tempfile.mkdtemp(prefix="srate_")
    try:
        q = run_budget_stream(spark, d + "/out", rows_per_batch=300, n_hosts=3)
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            time.sleep(2)
            try:
                rows = spark.read.parquet(d + "/out").collect()
            except Exception:
                rows = []
            hosts = {r["host"] for r in rows}
            if len(rows) >= 9 and len(hosts) == 3:
                break
        q.stop()
        assert len(rows) >= 6, "stream produced too few budget decisions"

        by_host = {}
        for r in sorted(rows, key=lambda r: (r["host"], r["iteration"])):
            by_host.setdefault(r["host"], []).append(r)
        for host, seq in by_host.items():
            rate = HostRate(max_num=160.0)
            for r in seq:
                expect = rate.update(r["n_success"], r["n_fail"])
                assert r["budget"] == expect, (host, r["iteration"])
                assert abs(r["cur"] - rate.cur) < 1e-12
    finally:
        shutil.rmtree(d, ignore_errors=True)
