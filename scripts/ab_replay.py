"""Interleaved A/B replay session: HEAD vs an older checkout.

Settles whether the round-over-round decline of the reference-scale
replay (35.2 -> 32.1 -> 26.4 -> 21.5 pages/s across four sessions,
BENCH/BASELINE.md) is VM-allotment noise (A ~= B) or real per-wave
cost creep (A < B).  Both sides run the SAME scaled workload
(`scripts/replay_reference.py N_FUNDS`) through their own checkout's
wave loop, strictly alternating within one session so any allotment
swing hits both sides equally.

Usage:
    python scripts/ab_replay.py OTHER_CHECKOUT_DIR [n_funds] [trials] [out.jsonl]

Emits one JSON line per run {side, trial, wall_sec, pages, waves,
pages_per_sec} to stdout and appends to out.jsonl (default
/tmp/ab_replay.jsonl), then a summary line with per-side best/median.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HEAD_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OTHER_DIR = sys.argv[1]
N_FUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2600
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
OUT = sys.argv[4] if len(sys.argv) > 4 else "/tmp/ab_replay.jsonl"


def run_once(side: str, root: str, trial: int) -> dict:
    # pin the driver heap for BOTH sides: the 48g replay default only
    # appeared in round 3, and the r2 checkout OOMs at 2600 funds on
    # the old 8g default — heap size must not be the A/B variable
    env = dict(os.environ, SPARK_DRIVER_MEM="48g")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "replay_reference.py"),
         str(N_FUNDS)],
        cwd=root, capture_output=True, text=True, timeout=3600, env=env,
    )
    out_lines = proc.stdout.strip().splitlines()
    if proc.returncode != 0 or not out_lines:
        return {"side": side, "trial": trial, "n_funds": N_FUNDS,
                "error": True, "rc": proc.returncode,
                "stderr_tail": proc.stderr.strip().splitlines()[-8:]}
    rec = json.loads(out_lines[-1])
    rec.update({"side": side, "trial": trial, "n_funds": N_FUNDS})
    return rec


def main() -> None:
    results: list[dict] = []
    with open(OUT, "a") as fh:
        for trial in range(1, TRIALS + 1):
            for side, root in (("HEAD", HEAD_DIR), ("OTHER", OTHER_DIR)):
                rec = run_once(side, root, trial)
                results.append(rec)
                print(json.dumps(rec), flush=True)
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
        summary = {}
        for side in ("HEAD", "OTHER"):
            vals = [r["pages_per_sec"] for r in results
                    if r["side"] == side and not r.get("error")]
            if not vals:
                summary[side] = {"pages_per_sec_all": [], "best": None,
                                 "median": None}
                continue
            summary[side] = {
                "pages_per_sec_all": vals,
                "best": max(vals),
                "median": round(statistics.median(vals), 2),
            }
        if summary["HEAD"]["best"] and summary["OTHER"]["best"]:
            summary["ratio_best_HEAD_over_OTHER"] = round(
                summary["HEAD"]["best"] / summary["OTHER"]["best"], 3)
        print(json.dumps({"summary": summary}), flush=True)
        fh.write(json.dumps({"summary": summary}) + "\n")


if __name__ == "__main__":
    main()
