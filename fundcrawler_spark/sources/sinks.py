"""Sinks: byte-compatible CSV (the reference's result.csv shape) and
the IcebergLite table appends used by the wave loop.

Reference CSV contract (save_result_2_file.py:11-33): header row is the
Header enum's Chinese strings in enum order; missing values render as
the literal string 'None' (restval='None', :28-29)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CSV_HEADERS, RESULT_FIELDS


def write_result_csv(result: DataFrame, path: str, single_file: bool = True) -> None:
    """12-column result table -> reference-compatible CSV: Chinese
    headers, NULL -> 'None'."""
    out = result.select(
        *[F.coalesce(F.col(f), F.lit("None")).alias(CSV_HEADERS[f]) for f in RESULT_FIELDS]
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)


def read_result_csv(spark, path: str) -> DataFrame:
    """Read a reference-shaped CSV back to ASCII column names with real
    NULLs (result_analyse.py reads 'None' strings; we invert that at
    the boundary)."""
    raw = spark.read.option("header", True).csv(path)
    inv = {v: k for k, v in CSV_HEADERS.items()}
    cols = []
    for c in raw.columns:
        name = inv.get(c, c)
        cols.append(F.nullif(F.col(c), F.lit("None")).alias(name))
    return raw.select(*cols)
