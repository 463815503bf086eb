"""RE2 Arrow parse twin: the named-group RE2 patterns must extract
exactly what the reference's java-style backtracking patterns extract.

Python ``re`` shares java.util.regex's backtracking leftmost-first
semantics (same lazy-quantifier behaviour, no RE2-style leftmost-longest
surprises), so it serves as the reference engine here; the DuckDB
oracles in entry_queries keep pinning the end-to-end queries.
"""

from __future__ import annotations

import re

import pytest

from fundcrawler_spark.functions.parse import NUMBER_IN_ENG
from fundcrawler_spark.functions.parse_arrow import RE2_FIELDS, extract_re2

# the reference patterns (functions/parse.py) and the group index each
# field extracts
JAVA_FIELDS = {
    "fund_type": (r"基金类型</th><td>(.+?)</td></tr><tr><th>发行日期", 1),
    "fund_size": (rf"资产规模</th><td>({NUMBER_IN_ENG})亿元", 1),
    "fund_company": (r'基金管理人</th><td><a.*?">(.+?)</a></td><th>基金托管人', 1),
    "fund_value": (rf"单位净值.*?：[\s\S]*?({NUMBER_IN_ENG})\s", 1),
    "fund_manager": (r"现任基金经理简介[\s\S]+?姓名：[\s\S]+?<a.+?>(.+?)</a>", 1),
    "date_of_appointment": (r"现任基金经理简介[\s\S]+?上任日期：[\s\S]+?>(.+?)</p>", 1),
    "stddev_3y": (r"标准差.+?'>(.+?)<.+?'>(.+?)<.+?'>(.+?)<", 3),
    "sharpe_3y": (r"夏普比率.+?'>(.+?)<.+?'>(.+?)<.+?'>(.+?)<", 3),
    "increase_3y": (rf"近3年[\s\S]*?(({NUMBER_IN_ENG})%|---)", 1),
    "increase_5y": (rf"近5年[\s\S]*?(({NUMBER_IN_ENG})%|---)", 1),
}


def _bodies() -> list[str]:
    """Generated bodies of every page type plus adversarial shapes:
    no-match, sentinels, negatives, thousand separators, multi-match,
    newlines, nested tags."""
    out = []
    for k in range(200):
        typ = ["债券型", "股票型", "混合型", "指数型"][k % 4]
        size_raw = f"{1 + k % 9},{k % 1000:03d}.{k % 100:02d}"
        comp = ["华夏基金", "易方达基金", "南方基金", "天弘基金", "嘉实基金"][k % 5]
        nav = f"{k % 4}.{k % 10000:04d}"
        out.append(
            f"<tr><th>基金类型</th><td>{typ}</td></tr><tr><th>发行日期</th></tr>"
            f"<tr><th>资产规模</th><td>{size_raw}亿元（截止）</td></tr>"
            f'<tr><th>基金管理人</th><td><a href="x">{comp}</a></td><th>基金托管人</th></tr>'
            f"<p>单位净值（2026-08-01）：{nav} </p>"
        )
        sd = "--" if k % 7 == 0 else f"{k % 30}.{k % 100:02d}%"
        sp = "--" if k % 7 == 0 else f"{k % 5}.{k % 100:02d}"
        out.append(
            "<tr>标准差</td><td class='num'>1.11%<td class='num'>2.22%"
            f"<td class='num'>{sd}<</tr><tr>夏普比率</td><td class='num'>0.50"
            f"<td class='num'>0.80<td class='num'>{sp}<</tr>"
        )
        i3 = "---" if k % 5 == 0 else f"{(k % 200 - 50) / 10:+.1f}%".replace("+", "")
        out.append(f"近3年：<b>{i3}</b> ... 近5年：<b>{k % 300}.0%</b>")
        mgr = ["张三丰", "李四光", "王五强", "赵六一", "孙七海"][k % 5]
        out.append(
            "<div>现任基金经理简介</div>"
            f'<p>姓名：<td><a href="m">{mgr}</a></p><p>上任日期：<td>2016-0{1 + k % 9}-11</p>'
        )
    out += [
        "",
        "no markers at all",
        "<div>现任基金经理简介</div><p>无数据</p>",
        "资产规模</th><td>亿元",  # marker present, number absent
        "资产规模</th><td>12,345,678.99亿元 资产规模</th><td>1.0亿元",  # multi-match
        "单位净值：\n\n  -3.5 tail 单位净值：9.9 ",  # newline + negative + repeat
        "近3年：<b>-0.0%</b>近3年：<b>5.5%</b>",
        "标准差'>a<'>b<'>c< 标准差'>d<'>e<'>f<",
        "基金类型</th><td><i>嵌套</i></td></tr><tr><th>发行日期",  # nested tag in value
        "夏普比率</td><td class='num'>--<td class='num'>--<td class='num'>--<",
    ]
    return out


@pytest.mark.parametrize("field", sorted(RE2_FIELDS))
def test_re2_matches_backtracking_reference(field):
    pat, grp = JAVA_FIELDS[field]
    cpat = re.compile(pat)
    import pyarrow as pa
    import pyarrow.compute as pc

    bodies = _bodies()
    st = pc.extract_regex(pa.array(bodies), pattern=RE2_FIELDS[field])
    got = pc.struct_field(st, "g").to_pylist()
    for body, g in zip(bodies, got):
        m = cpat.search(body)
        want = m.group(grp) if m else None
        assert g == want, (field, body, want, g)


def test_extract_re2_dataframe(spark):
    rows = [(i, b) for i, b in enumerate(_bodies())]
    df = spark.createDataFrame(rows, "o_orderkey long, body string")
    out = extract_re2(
        df, ["fund_type", "fund_size"], [("o_orderkey", "long")]
    ).collect()
    assert len(out) == len(rows)
    by_id = {r["o_orderkey"]: r for r in out}
    cpat = re.compile(JAVA_FIELDS["fund_type"][0])
    for i, b in rows:
        m = cpat.search(b)
        assert by_id[i]["fund_type"] == (m.group(1) if m else None)
