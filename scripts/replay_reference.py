"""Full reference-scale replay (BENCH/BASELINE.md 'Full reference-scale
replay'): the reference's own workload — 16,445 funds x 4 pages =
65,780 fetches (reference README.md:14, wall time 5,385 s) — through
the wave loop with the stub transport, the same AIMD politeness budget
(cap 160 = cpu*5 analog), per-25-wave durable checkpoints.

Usage: python scripts/replay_reference.py [n_funds]
Prints one JSON line {wall_sec, pages, waves, pages_per_sec}.
PHASES=1 additionally dumps a per-wave phase breakdown (refill /
fetch+agg / discover / checkpoint wall seconds, cfg.wave_hook) to
PHASES_OUT (default /tmp/replay_phases.jsonl) — used to attribute
the r5 A/B-confirmed wave-cost creep to a specific loop phase.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 16445


def main() -> None:
    from fundcrawler_spark import fixtures as fx
    from fundcrawler_spark.plans.wave_loop import Crawler, CrawlConfig
    from fundcrawler_spark.schemas import SEEDS_SCHEMA
    from fundcrawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # a 412-wave replay accumulates checkpoint reads + shard blobs well
    # past the 8g default heap; size it like the scaling harness does
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(app_name="replay", cores=cpus, shuffle_partitions=cpus)
    seeds = spark.createDataFrame(fx.seed_rows(N_FUNDS), SEEDS_SCHEMA)
    wd = tempfile.mkdtemp(prefix="replay_")
    phase_rows: list[dict] = []
    phases_on = os.environ.get("PHASES", "0") == "1"
    try:
        cfg = CrawlConfig(
            fail_rate=0.0,
            max_waves=1000,
            n_shards=32,
            init_budget=160.0,   # warm budget: measure the engine, not
            max_budget=160,      # the (bit-verified) AIMD cold-start
            checkpoint_every=25,
            shard_capacity=2_000_000,  # 65,780 keys / 32 shards + margin,
                                       # scaled the same way the 10^10
                                       # point sizes 1024 x 10M
            wave_hook=phase_rows.append if phases_on else None,
        )
        t0 = time.time()
        stats = Crawler(spark, wd, cfg).run(seeds=seeds, log=lambda *a: None)
        dt = time.time() - t0
        print(json.dumps({
            "wall_sec": round(dt, 1),
            "pages": stats["pages_fetched"],
            "waves": stats["waves"],
            "pages_per_sec": round(stats["pages_fetched"] / dt, 2),
        }))
        if phases_on:
            out = os.environ.get("PHASES_OUT", "/tmp/replay_phases.jsonl")
            with open(out, "w") as fh:
                for row in phase_rows:
                    fh.write(json.dumps(row) + "\n")
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
