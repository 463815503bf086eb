"""Page-body parse layer — regexp_extract Column trees, zero Python.

Each of the reference's four ``DataCleaningStrategy`` classes becomes a
dict of named Column expressions over a ``body`` string column. Patterns
are the reference's own (file:line cited per field); no-match maps to SQL
NULL (the reference leaves the dict key absent, which its sink renders as
the string ``'None'`` — ``save_result_2_file.py:28-29``; we keep real
NULLs and only fill ``'None'`` at the CSV-compat sink).

Spark regexes are Java ``java.util.regex`` — all reference patterns
(lazy quantifiers, ``[\\s\\S]``) are valid there unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared numeric pattern — reference impl/constants.py:6
NUMBER_IN_ENG = r"-?(\d+?(,\d+)*?(\.\d+)?)"


def _x(body: Column, pattern: str, group: int = 1) -> Column:
    """regexp_extract with no-match ('' in Spark) -> NULL."""
    return F.nullif(F.regexp_extract(body, pattern, group), F.lit(""))


# ------------------------------------------------------------- OVERVIEW
# Reference: impl/overview.py:18-21,29-42
def parse_overview(body: Column) -> dict[str, Column]:
    fund_size = _x(body, rf"资产规模</th><td>({NUMBER_IN_ENG})亿元", 1)
    return {
        "fund_type": _x(body, r"基金类型</th><td>(.+?)</td></tr><tr><th>发行日期", 1),
        # thousands-separator strip mirrors overview.py:35 replace(',','')
        "fund_size": F.regexp_replace(fund_size, ",", ""),
        "fund_company": _x(
            body, r'基金管理人</th><td><a.*?">(.+?)</a></td><th>基金托管人', 1
        ),
        "fund_value": _x(body, rf"单位净值.*?：[\s\S]*?({NUMBER_IN_ENG})\s", 1),
    }


# -------------------------------------------------------------- MANAGER
# Reference: impl/manager.py:17-18,26-31
def parse_manager(body: Column) -> dict[str, Column]:
    return {
        "fund_manager": _x(
            body, r"现任基金经理简介[\s\S]+?姓名：[\s\S]+?<a.+?>(.+?)</a>", 1
        ),
        "date_of_appointment": _x(
            body, r"现任基金经理简介[\s\S]+?上任日期：[\s\S]+?>(.+?)</p>", 1
        ),
    }


# -------------------------------------------------------------- METRICS
# Reference: impl/sharpe.py:15-16,24-35 — positional group 3 is the
# 3-year column; '--' is the site's no-data sentinel.
def parse_metrics(body: Column) -> dict[str, Column]:
    return {
        "stddev_3y": F.nullif(
            _x(body, r"标准差.+?'>(.+?)<.+?'>(.+?)<.+?'>(.+?)<", 3), F.lit("--")
        ),
        "sharpe_3y": F.nullif(
            _x(body, r"夏普比率.+?'>(.+?)<.+?'>(.+?)<.+?'>(.+?)<", 3), F.lit("--")
        ),
    }


# ------------------------------------------------------------- INCREASE
# Reference: impl/increase.py (RiseStrategy) :18-19,27-37 — group 1 is
# either '<number>%' or the '---' sentinel.
def parse_increase(body: Column) -> dict[str, Column]:
    return {
        "increase_3y": F.nullif(
            _x(body, rf"近3年[\s\S]*?({NUMBER_IN_ENG}%|---)", 1), F.lit("---")
        ),
        "increase_5y": F.nullif(
            _x(body, rf"近5年[\s\S]*?({NUMBER_IN_ENG}%|---)", 1), F.lit("---")
        ),
    }


PARSERS = {
    "OVERVIEW": parse_overview,
    "MANAGER": parse_manager,
    "METRICS": parse_metrics,
    "INCREASE": parse_increase,
}

# result column -> page type that produces it
FIELD_SOURCE = {
    "fund_type": "OVERVIEW",
    "fund_size": "OVERVIEW",
    "fund_company": "OVERVIEW",
    "fund_value": "OVERVIEW",
    "fund_manager": "MANAGER",
    "date_of_appointment": "MANAGER",
    "stddev_3y": "METRICS",
    "sharpe_3y": "METRICS",
    "increase_3y": "INCREASE",
    "increase_5y": "INCREASE",
}


def parse_all(body_cols: dict[str, Column]) -> dict[str, Column]:
    """Given one body column per page type (post barrier-join pivot),
    produce all 10 extracted result columns."""
    out: dict[str, Column] = {}
    for ptype, parser in PARSERS.items():
        out.update(parser(body_cols[ptype]))
    return out


# Typed casts used by the analysis job (result_analyse.py:49-66):
def percent_to_double(col: Column) -> Column:
    """'12.34%' -> 12.34 (reference float(increase[:-1]))."""
    return F.regexp_replace(col, "%$", "").cast("double")
