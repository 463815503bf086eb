"""Backlog-scale evidence: per-wave wall time vs frontier backlog size.

The 10^10-URL claim rests on the split-frontier design: steady-state
waves touch only the bounded ACTIVE slice, so per-wave time must be
flat in the size of the static BACKLOG. This script measures exactly
that — the same crawl (one host, fixed per-wave admission budget, stub
transport) over synthetic frontiers of 10^6 / 10^7 / 10^8 rows, in both
static and discovery mode, reporting per-wave wall times (captured from
the wave loop's own log callback), the one-time split-build cost, and
the final durable-checkpoint cost (both of which ARE O(frontier), by
design, at checkpoint cadence).

    SPARK_DRIVER_MEM=48g python scripts/bench_backlog.py
    BACKLOGS=1000000,10000000 DISCOVER=1 python scripts/bench_backlog.py

Prints one JSON line per (backlog, mode) plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BACKLOGS = [int(float(b)) for b in os.environ.get(
    "BACKLOGS", "1000000,10000000,100000000").split(",")]
WAVES = int(os.environ.get("WAVES", "10"))
DISCOVER = os.environ.get("DISCOVER", "0") == "1"
STATIC = os.environ.get("STATIC", "1") == "1"
# PHASES=1: per-wave phase breakdown (refill / fetch+agg / discover /
# checkpoint) + JVM GC delta per wave — attributes wave-time outliers
PHASES = os.environ.get("PHASES", "0") == "1"


def synth_seeds(spark, n_rows: int):
    """n_rows/4 seeds -> n_rows frontier rows after the 4-page fan-out,
    generated JVM-side (spark.range) — no driver-side row lists."""
    from pyspark.sql import functions as F

    n_seeds = max(n_rows // 4, 1)
    return spark.range(n_seeds).select(
        F.lpad(F.col("id").cast("string"), 8, "0").alias("fund_code"),
        F.concat(F.lit("fund"), F.col("id").cast("string")).alias("fund_name"),
        F.col("id").cast("int").alias("seed_index"),
    )


def _gc_millis(spark) -> int:
    """Total JVM GC time (ms) across collectors — deltas attribute
    wave-time outliers to GC pauses."""
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def run_one(spark, n_rows: int, discover: bool) -> dict:
    from fundcrawler_spark.plans.wave_loop import Crawler, CrawlConfig

    seeds = synth_seeds(spark, n_rows)
    wd = tempfile.mkdtemp(prefix=f"backlog_{n_rows}_")
    wave_times: list[float] = []
    phase_rows: list[dict] = []
    gc_last = [_gc_millis(spark)]

    def log(msg):
        wave_times.append(time.time())

    def wave_hook(row: dict) -> None:
        g = _gc_millis(spark)
        row["gc_ms"] = g - gc_last[0]
        gc_last[0] = g
        phase_rows.append(row)

    try:
        cfg = CrawlConfig(
            fail_rate=0.0,
            max_waves=WAVES,
            max_budget=160,
            init_budget=160.0,          # fixed admission: 160 pages/wave
            active_slice_waves=16,       # slice 2560 > 10 waves x 160 -> no refill
            checkpoint_every=10 ** 9,    # no mid-run durable checkpoints
            n_shards=64,
            discover=discover,
            wave_hook=wave_hook if PHASES else None,
        )
        c = Crawler(spark, wd, cfg)
        t0 = time.time()
        stats = c.run(seeds=seeds, log=log)
        total = time.time() - t0
        # log fires at wave END: wave_times[0]-t0 covers frontier build +
        # initial split + wave 0; diffs are the steady-state waves; the
        # tail after the last wave is flush + final durable checkpoint
        # (an O(frontier) parquet rewrite, by design at checkpoint
        # cadence only)
        steady = [
            round(b - a, 3) for a, b in zip(wave_times, wave_times[1:])
        ]
        sm = sorted(steady)
        if PHASES:
            return {
                "backlog_rows": n_rows,
                "discover": discover,
                "waves": stats["waves"],
                "build_split_wave0_sec": round(wave_times[0] - t0, 2),
                "steady_median_sec": sm[len(sm) // 2] if sm else None,
                "final_checkpoint_sec": round(total - (wave_times[-1] - t0), 2) if wave_times else None,
                "total_sec": round(total, 2),
                "wave_phases": phase_rows,
            }
        return {
            "backlog_rows": n_rows,
            "discover": discover,
            "waves": stats["waves"],
            "pages_fetched": stats["pages_fetched"],
            "build_split_wave0_sec": round(wave_times[0] - t0, 2),
            "steady_wave_secs": steady,
            "steady_median_sec": sm[len(sm) // 2] if sm else None,
            "steady_max_sec": sm[-1] if sm else None,
            "final_checkpoint_sec": round(total - (wave_times[-1] - t0), 2) if wave_times else None,
            "total_sec": round(total, 2),
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    from fundcrawler_spark.session import get_spark

    spark = get_spark("bench_backlog", cores=CPUS)
    out = []
    for b in BACKLOGS:
        modes = ([False] if STATIC else []) + ([True] if DISCOVER else [])
        for disc in modes:
            r = run_one(spark, b, disc)
            print(json.dumps(r), flush=True)
            out.append(r)
    summary = {
        "metric": "steady-state wave time vs backlog size",
        "unit": "sec/wave",
        "per_backlog": {
            f"{r['backlog_rows']}{'/discover' if r['discover'] else ''}":
                r["steady_median_sec"]
            for r in out
        },
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
