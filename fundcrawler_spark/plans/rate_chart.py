"""Rate-control analyse chart — the reference's matplotlib analyse
mode (rate_control_analyse.py:8-35, referenced from README.md:37-43)
re-expressed over the engine's fetch_log table.

The reference reads its rate-log CSV and plots three per-update
series: fail_rate (own axis) and tasks_num / threshold_num (shared
twin axis). Here the same series come from analyze_rate_log (the
oracle-checked ``rate_log_analysis`` query), one chart per host.

Rendering: matplotlib when importable (it is in the reference's
requirements.txt — public-surface parity); otherwise a dependency-free
SVG writer with the same two-axis layout, so the chart path is real
and tested even in minimal containers (this sandbox has no
matplotlib). The data plane is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .rate_control import analyze_rate_log


def rate_series(log: DataFrame, host: str | None = None):
    """fetch_log -> ordered per-wave (fail_rate, tasks_num,
    threshold_num) series for one host (default: the only host, as in
    the reference's single-site crawl)."""
    agg = analyze_rate_log(log)
    if host is None:
        hosts = [r["host"] for r in agg.select("host").distinct().collect()]
        if len(hosts) != 1:
            raise ValueError(
                f"fetch_log has {len(hosts)} hosts; pass host= explicitly"
            )
        host = hosts[0]
    rows = agg.filter(agg["host"] == host).orderBy("wave").collect()
    return (
        host,
        [float(r["fail_rate"]) for r in rows],
        [float(r["tasks_num"]) for r in rows],
        [float(r["threshold_num"]) for r in rows],
    )


def _svg_polyline(xs, ys, w, h, y_min, y_max, color) -> str:
    if not ys:
        return ""
    span = (y_max - y_min) or 1.0
    n = max(len(ys) - 1, 1)
    pts = " ".join(
        f"{40 + x * (w - 80) / n:.1f},{h - 30 - (y - y_min) * (h - 60) / span:.1f}"
        for x, y in zip(xs, ys)
    )
    return (f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{pts}"/>')


def _write_svg(path: str, host: str, fail_rate, tasks, thresh) -> None:
    w, h = 640, 360
    xs = list(range(len(fail_rate)))
    right_max = max(tasks + thresh + [1.0])
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}">',
        f'<rect width="{w}" height="{h}" fill="white"/>',
        f'<text x="20" y="18" font-size="13">rate control — {host}</text>',
        # left axis: fail_rate in [0, 1]; right axis: tasks/threshold
        _svg_polyline(xs, fail_rate, w, h, 0.0, 1.0, "#d62728"),
        _svg_polyline(xs, tasks, w, h, 0.0, right_max, "#1f77b4"),
        _svg_polyline(xs, thresh, w, h, 0.0, right_max, "#bcbd22"),
        '<text x="40" y="345" font-size="11" fill="#d62728">fail_rate (left, 0-1)</text>',
        f'<text x="220" y="345" font-size="11" fill="#1f77b4">tasks_num (right, 0-{right_max:g})</text>',
        '<text x="430" y="345" font-size="11" fill="#bcbd22">threshold_num</text>',
        "</svg>",
    ]
    with open(path, "w") as f:
        f.write("\n".join(p for p in parts if p))


def draw_rate_analysis(log: DataFrame, out_path: str,
                       host: str | None = None) -> str:
    """Write the analyse chart for ``host`` to ``out_path`` (png with
    matplotlib, svg otherwise — the extension is adjusted to match the
    backend). Returns the path actually written."""
    host, fail_rate, tasks, thresh = rate_series(log, host)
    base = out_path.rsplit(".", 1)[0]
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
    except ImportError:
        path = base + ".svg"
        _write_svg(path, host, fail_rate, tasks, thresh)
        return path
    # the reference's exact layout: fail_rate on its own axis,
    # tasks_num + threshold_num on a twinx
    fig = plt.figure()
    ax1 = fig.add_subplot()
    x = range(len(fail_rate))
    ax1.plot(x, fail_rate, "-", label="fail_rate", color="r")
    ax1.legend()
    ax2 = ax1.twinx()
    ax2.plot(x, tasks, "-", label="tasks_num", color="b")
    ax2.plot(x, thresh, "-", label="threshold_num", color="y")
    ax2.legend()
    path = base + ".png"
    fig.savefig(path)
    plt.close(fig)
    return path
