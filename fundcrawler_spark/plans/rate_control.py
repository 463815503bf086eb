"""AIMD politeness rate control — control-plane port of the reference's
semantics (NOT its code): utils/downloader/rate_control/rate_control.py.

Semantics, line-cited against the reference:
  * ring of the last 10 waves' success/fail counts (:22-26)
  * fail_rate = sum(fail_ring) / sum(both rings), 0 when empty (:53-57)
  * fail_rate > 0: on the first wave of a fail-burst, threshold
    (_last_number) := current; current := 0; latch until recovery
    (:60-65 — one adjustment per fail-burst via _fail_has_recover)
  * fail_rate == 0: step = max(0.01, ((last-cur)/last)^2 * 0.1) while
    cur < last else 0.01; cur := min(cap, max(last/2, cur+step))
    (:66-75 — quadratic approach + jump back to half the threshold)
  * init: cur=1.0, threshold=12, cap=cpus*5 (:19,29-31)
  * admitted concurrency per wave = int(cur) (:81-82)

This is deliberately tiny driver-side state per host (SURVEY.md §4:
"resist the urge to Spark-ify the control plane") — a dict of ~hosts
entries updated once per wave from an aggregated (host, success, fail)
metrics DataFrame of a few rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

RING = 10
INIT_THRESHOLD = 12.0
MIN_STEP = 0.01


@dataclass
class HostRate:
    """Per-host AIMD state (one reference RateControl instance worth)."""

    max_num: float = 160.0  # cpu*5 analog (rate_control.py:30)
    cur: float = 1.0
    last: float = INIT_THRESHOLD
    fail_has_recover: bool = True
    iterations: int = 0
    success_ring: list[int] = field(default_factory=lambda: [0] * RING)
    fail_ring: list[int] = field(default_factory=lambda: [0] * RING)
    # telemetry: the fail rate computed by the latest update() — the
    # reference's analyse mode logs (fail_rate, tasks_num, threshold)
    # per update (rate_control.py:42-47); we persist the same triple
    # into fetch_log
    last_fail_rate: float = 0.0

    def update(self, success_count: int, fail_count: int) -> int:
        """One wave's counts in -> admitted concurrency for the next wave."""
        i = self.iterations % RING
        self.success_ring[i] = success_count
        self.fail_ring[i] = fail_count
        total = sum(self.success_ring) + sum(self.fail_ring)
        fail_rate = (sum(self.fail_ring) / total) if total else 0.0
        self.last_fail_rate = fail_rate

        if fail_rate > 0.0:
            if self.fail_has_recover:
                self.last = self.cur
            self.cur = 0.0
            self.fail_has_recover = False
        else:
            self.fail_has_recover = True
            if self.cur < self.last:
                rate = ((self.last - self.cur) / self.last) ** 2
                step = max(MIN_STEP, rate * MIN_STEP * 10)
            else:
                step = MIN_STEP
            number = max(self.last / 2.0, self.cur + step)
            self.cur = min(self.max_num, number)

        self.iterations += 1
        return int(self.cur)

    def to_dict(self) -> dict:
        return {
            "max_num": self.max_num,
            "cur": self.cur,
            "last": self.last,
            "fail_has_recover": self.fail_has_recover,
            "iterations": self.iterations,
            "success_ring": list(self.success_ring),
            "fail_ring": list(self.fail_ring),
            "last_fail_rate": self.last_fail_rate,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "HostRate":
        return cls(**d)


def analyze_rate_log(log):
    """The reference's rate-control analysis job re-expressed over the
    fetch_log table (rate_control_analyse.py:8-35: scan the rate log,
    extract the (fail_rate, tasks_num, threshold) series rounded to 3
    decimals). fetch_log is per (wave, host, partition); telemetry is
    identical within a (wave, host) so max() collapses the lineage
    fan-out while the counters sum."""
    from pyspark.sql import functions as F

    return (
        log.groupBy("host", "wave")
        .agg(
            F.sum("n_admitted").alias("n_admitted"),
            F.sum("n_fail").alias("n_fail"),
            F.round(F.max("fail_rate_w10"), 3).alias("fail_rate"),
            F.round(F.max("budget"), 3).alias("tasks_num"),
            F.round(F.max("threshold"), 3).alias("threshold_num"),
        )
    )


class BudgetTable:
    """host -> HostRate; the driver-side politeness budget between waves.

    ``init_cur`` overrides the reference's cold-start cur=1.0 (useful
    for benchmarks where the AIMD warm-up is not the thing measured).
    """

    def __init__(self, max_num: float = 160.0, init_cur: float | None = None):
        self.max_num = max_num
        self.init_cur = init_cur
        self.rates: dict[str, HostRate] = {}
        self.budgets: dict[str, int] = {}

    def _new_rate(self) -> HostRate:
        r = HostRate(max_num=self.max_num)
        if self.init_cur is not None:
            r.cur = r.last = float(self.init_cur)
        return r

    def budget_for(self, host: str) -> int:
        if host not in self.budgets:
            self.budgets[host] = self.rates.setdefault(host, self._new_rate()).update(0, 0)
        return self.budgets[host]

    def observe_wave(self, counts: dict[str, tuple[int, int]], hosts_seen: set[str]) -> dict[str, int]:
        """Feed (success, fail) per host for the finished wave; hosts in
        ``hosts_seen`` with no counts get (0, 0) — exactly one ring tick
        per host per wave."""
        for host in hosts_seen:
            s, f = counts.get(host, (0, 0))
            rate = self.rates.setdefault(host, self._new_rate())
            self.budgets[host] = rate.update(s, f)
        return dict(self.budgets)

    def telemetry_for(self, host: str) -> tuple[float, float, float]:
        """(fail_rate, tasks_num=cur, threshold=last) — the triple the
        reference's analyse mode writes per update
        (rate_control.py:42-47, rate_control_analyse.py:16-19)."""
        r = self.rates.get(host)
        if r is None:
            return (0.0, 0.0, INIT_THRESHOLD)
        return (r.last_fail_rate, r.cur, r.last)

    def to_dict(self) -> dict:
        return {h: r.to_dict() for h, r in self.rates.items()}

    @classmethod
    def from_dict(cls, d: dict, max_num: float = 160.0) -> "BudgetTable":
        bt = cls(max_num=max_num)
        for h, rd in d.items():
            bt.rates[h] = HostRate.from_dict(rd)
            bt.budgets[h] = int(bt.rates[h].cur)
        return bt
