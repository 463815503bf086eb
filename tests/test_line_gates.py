"""Line-level corpus gates: C4 line/doc rules and Gopher
duplicate-line signals over the planted multi-line fixture."""

from pyspark.sql import functions as F

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.operators.textstats import (
    c4_line_gates,
    dup_line_signals,
)


def _docs(spark, n=40):
    return spark.createDataFrame(
        fx.corpus_line_rows(n), "doc_id string, text string"
    )


def _pure_python_c4(rows):
    """Independent per-doc recompute of every c4_line_gates column."""
    out = {}
    for doc_id, text in rows:
        lines = text.split("\n")
        poisoned = "lorem ipsum" in text.lower() or "{" in text
        kept = [
            ln
            for ln in lines
            if ln[-1:] in ".!?"
            and len([w for w in ln.split(" ") if w]) >= 5
            and "javascript" not in ln.lower()
        ]
        total = sum(len(ln) for ln in lines)
        keptc = sum(len(ln) for ln in kept)
        out[doc_id] = (
            len(lines),
            len(kept),
            total,
            keptc,
            keptc / max(total, 1),
            len(kept) >= 3 and not poisoned,
        )
    return out


def test_c4_gates_match_pure_python(spark):
    rows = fx.corpus_line_rows(40)
    expect = _pure_python_c4(rows)
    got = {
        r["doc_id"]: (
            r["n_lines"],
            r["n_kept_lines"],
            r["total_chars"],
            r["kept_chars"],
            r["kept_char_frac"],
            r["doc_kept"],
        )
        for r in c4_line_gates(_docs(spark, 40)).collect()
    }
    assert got == expect


def test_c4_poison_branches_fire(spark):
    """The fixture plants both poison kinds and both line-drop kinds;
    assert each branch actually flips at least one doc/line."""
    res = {r["doc_id"]: r for r in c4_line_gates(_docs(spark, 60)).collect()}
    rows = dict(fx.corpus_line_rows(60))
    lorem = [i for i, t in rows.items() if "lorem ipsum" in t.lower()]
    brace = [i for i, t in rows.items() if "{" in t]
    assert lorem and brace
    # poisoned docs are dropped even with >=3 kept lines
    assert all(not res[i]["doc_kept"] for i in lorem + brace)
    # some clean doc IS kept
    assert any(
        res[i]["doc_kept"] for i in rows if i not in set(lorem + brace)
    )
    # every doc has at least one dropped line (the nav-menu line)
    assert all(r["n_kept_lines"] < r["n_lines"] for r in res.values())


def test_dup_line_signals_hand_case(spark):
    """Hand-built doc: line A x3, line B x1 -> dup_line_frac = 2/4,
    char fraction weighted by A's length."""
    a, b = "aaaa", "bb"
    df = spark.createDataFrame(
        [("d1", "\n".join([a, b, a, a])), ("d2", "solo")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in dup_line_signals(df).collect()}
    assert got["d1"]["n_lines"] == 4
    assert got["d1"]["dup_lines"] == 2
    assert got["d1"]["dup_line_frac"] == 2 / 4
    assert got["d1"]["dup_line_char_frac"] == (2 * 4) / (3 * 4 + 2)
    assert got["d2"]["dup_lines"] == 0
    assert got["d2"]["dup_line_char_frac"] == 0.0


def test_dup_line_fixture_plants_duplicates(spark):
    """Docs at i%3==0 plant one duplicate, i%15==0 plant two."""
    res = {
        r["doc_id"]: r for r in dup_line_signals(_docs(spark, 45)).collect()
    }
    assert res["line_0000"]["dup_lines"] == 2  # 0 % 3 == 0 and 0 % 5 == 0
    assert res["line_0003"]["dup_lines"] == 1
    assert res["line_0001"]["dup_lines"] == 0


def test_line_gate_plans_have_no_window_or_udf(spark):
    """Both ops must stay explode -> hash-agg: no window exec, no
    python UDF in the physical plan."""
    for op in (c4_line_gates, dup_line_signals):
        plan = op(_docs(spark, 10))._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
