"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship analysis query (the reference's
utils/result_analyse.py as one declarative query) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every SQL-expressible operator
from SURVEY.md §2 plus the training-data ops, registered in
``fundcrawler_spark.entry_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fundcrawler_spark.entry_queries import QUERIES, resolve_oracle  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["analysis_topk"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, (_, oracle) in QUERIES.items():
        sql = resolve_oracle(oracle)
        if sql is not None:
            out[name] = sql
    return out
