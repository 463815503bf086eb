"""RE2 (Arrow) twin of the page-body parse layer.

``functions/parse.py`` keeps the reference's patterns as JVM
``regexp_extract`` Column trees. That engine is ``java.util.regex`` — a
backtracking matcher whose per-row cost dominates the regex projection
queries at scale (r7 measurement: ~7 of regex_overview's ~8 s at sf1.0
were the four extracts, and rewriting the patterns to non-backtracking
equivalents did not move the number — the engine, not the pattern, is
the cost).

This module runs the SAME patterns through RE2 via
``pyarrow.compute.extract_regex`` inside ``mapInArrow`` (guide §4.2: the
batch goes to a vectorized native library; ~10x per-core in isolation).
RE2 is a linear-time engine with leftmost-first (Perl/Java) match
semantics for these patterns — no backreferences or lookaround are
used anywhere in the reference patterns, so the captures are identical
(pinned by tests/test_parse_arrow.py fuzz against ``re``, which shares
java.util.regex's backtracking leftmost-first semantics, plus the
DuckDB oracles which keep running the original patterns).

RE2 needs every capture group NAMED — the patterns below are the
reference patterns with ``(?P<name>...)`` added; the extracted group
(named ``g``) corresponds to the reference's requested group index.
No-match: ``extract_regex`` yields a null struct -> null field, which
equals the Column layer's ``nullif(regexp_extract(...), '')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# reference impl/constants.py:6 NUMBER_IN_ENG, groups named for RE2;
# `g` wraps what the reference captures as group 1
_NUM_G = r"(?P<g>-?(?P<n1>\d+?(?P<n2>,\d+)*?(?P<n3>\.\d+)?))"
_NUM_IN = r"(?P<i1>-?(?P<i2>\d+?(?P<i3>,\d+)*?(?P<i4>\.\d+)?))"

# field -> RE2 pattern whose group `g` is the reference extraction.
# Sources: impl/overview.py:18-21, impl/manager.py:17-18,
# impl/sharpe.py:15-16 (group 3), impl/increase.py:18-19 (group 1).
RE2_FIELDS: dict[str, str] = {
    "fund_type": r"基金类型</th><td>(?P<g>.+?)</td></tr><tr><th>发行日期",
    "fund_size": rf"资产规模</th><td>{_NUM_G}亿元",
    "fund_company": r'基金管理人</th><td><a.*?">(?P<g>.+?)</a></td><th>基金托管人',
    "fund_value": rf"单位净值.*?：[\s\S]*?{_NUM_G}\s",
    "fund_manager": r"现任基金经理简介[\s\S]+?姓名：[\s\S]+?<a.+?>(?P<g>.+?)</a>",
    "date_of_appointment": r"现任基金经理简介[\s\S]+?上任日期：[\s\S]+?>(?P<g>.+?)</p>",
    "stddev_3y": r"标准差.+?'>(?P<c1>.+?)<.+?'>(?P<c2>.+?)<.+?'>(?P<g>.+?)<",
    "sharpe_3y": r"夏普比率.+?'>(?P<c1>.+?)<.+?'>(?P<c2>.+?)<.+?'>(?P<g>.+?)<",
    "increase_3y": rf"近3年[\s\S]*?(?P<g>{_NUM_IN}%|---)",
    "increase_5y": rf"近5年[\s\S]*?(?P<g>{_NUM_IN}%|---)",
}


def extract_re2(
    df: DataFrame,
    fields: list[str],
    keys: list[tuple[str, str]],
    body_col: str = "body",
) -> DataFrame:
    """(keys..., field...) string columns extracted from ``body_col``
    with RE2. ``keys``: (name, spark_type) passthrough id columns.
    Only keys+body cross the Python boundary (guide §4.1), and only
    keys+extracts come back — the body never returns.
    """
    patterns = {f: RE2_FIELDS[f] for f in fields}
    key_names = [k for k, _ in keys]

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            body = batch.column(body_col)
            arrays = [batch.column(k) for k in key_names]
            for f, pat in patterns.items():
                st = pc.extract_regex(body, pattern=pat)
                arrays.append(pc.struct_field(st, "g"))
            yield pa.RecordBatch.from_arrays(
                arrays, names=key_names + list(patterns)
            )

    schema = ", ".join(
        [f"{k} {t}" for k, t in keys] + [f"{f} string" for f in patterns]
    )
    return df.select(*key_names, body_col).mapInArrow(kernel, schema)
