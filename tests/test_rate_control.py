"""Table-driven AIMD conformance vs hand-computed values of the
reference formula (rate_control.py:49-82)."""

import pytest

from fundcrawler_spark.plans.rate_control import RING, BudgetTable, HostRate


def test_initial_wave_budget():
    r = HostRate(max_num=160.0)
    # cur=1, last=12: rate=(11/12)^2=0.840..., step=max(.01,.0840)=.0840,
    # number=max(6, 1.0840)=6 -> int 6
    assert r.update(0, 0) == 6
    assert r.cur == pytest.approx(6.0)


def test_quadratic_step_near_threshold():
    r = HostRate(max_num=160.0)
    r.update(0, 0)  # cur=6
    b = r.update(6, 0)
    # rate=((12-6)/12)^2=0.25, step=max(.01,.025)=.025 -> cur=6.025
    assert b == 6 and r.cur == pytest.approx(6.025)


def test_fail_burst_halves_once_then_latches():
    r = HostRate(max_num=160.0)
    r.update(0, 0)
    assert r.update(5, 1) == 0  # fail -> threshold=cur(6), cur=0
    assert r.last == pytest.approx(6.0)
    # further fail-rate>0 waves (ring still holds the fail) keep cur=0
    # WITHOUT re-adjusting the threshold (the _fail_has_recover latch)
    assert r.update(0, 0) == 0
    assert r.last == pytest.approx(6.0)


def test_recovery_jumps_to_half_threshold():
    r = HostRate(max_num=160.0)
    r.update(0, 0)
    r.update(5, 1)
    for _ in range(RING - 1):  # drain the fail out of the ring
        r.update(0, 0)
    b = r.update(0, 0)  # ring clear: cur = max(6/2, 0+step)=3
    assert b == 3 and r.cur == pytest.approx(3.0)


def test_cap_at_max_num():
    r = HostRate(max_num=10.0)
    r.cur = r.last = 10.0
    r.update(10, 0)
    assert r.cur == pytest.approx(10.0)  # min(max_num, 10+0.01)


def test_budget_table_roundtrip():
    bt = BudgetTable(max_num=160.0)
    bt.budget_for("a")
    bt.observe_wave({"a": (5, 1)}, {"a", "b"})
    d = bt.to_dict()
    bt2 = BudgetTable.from_dict(d, max_num=160.0)
    assert bt2.rates["a"].to_dict() == bt.rates["a"].to_dict()
    assert bt2.rates["b"].iterations == 1  # ticked with (0,0)
