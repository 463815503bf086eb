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


def test_rate_chart_writes_reference_layout(spark, tmp_path):
    """plans/rate_chart.draw_rate_analysis — the reference's analyse
    mode (rate_control_analyse.py:8-35) over the fetch_log table. In
    this container matplotlib is absent, so the dependency-free SVG
    backend renders; the series math is the oracle-checked
    analyze_rate_log either way."""
    from fundcrawler_spark.plans.rate_chart import draw_rate_analysis, rate_series

    rows = []
    for w in range(6):
        for p in range(2):  # two partitions per wave: lineage fan-out
            rows.append((w, "h1", 10, 9, 1, 0.1 * w, 20.0 + w, 16.0, p, 5.0))
    log = spark.createDataFrame(
        rows,
        "wave int, host string, n_admitted long, n_success long, n_fail long, "
        "fail_rate_w10 double, budget double, threshold double, "
        "partition_id int, wall_ms double",
    )
    host, fr, tasks, thresh = rate_series(log)
    assert host == "h1" and len(fr) == 6
    assert tasks == [20.0 + w for w in range(6)]
    out = draw_rate_analysis(log, str(tmp_path / "rate.png"))
    text = open(out).read()
    if out.endswith(".svg"):
        assert "<svg" in text and text.count("<polyline") == 3
        for label in ("fail_rate", "tasks_num", "threshold_num"):
            assert label in text
    # multi-host logs require an explicit host
    log2 = log.union(spark.createDataFrame(
        [(0, "h2", 1, 1, 0, 0.0, 5.0, 16.0, 0, 1.0)], log.schema))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hosts"):
        rate_series(log2)
    assert len(rate_series(log2, host="h2")[1]) == 1
