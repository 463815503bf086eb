"""Barrier group-join + result assembly.

The reference's only join: each fetched page is hash-joined back to its
fund context and the context completes when all 4 pages returned
(``async_crawling_data.py:46-76,127-131``). In Spark that barrier is a
pivot: group fetched pages by seed, pivot on page_type (explicit value
list -> no extra pass to discover values), HAVING count == 4, then run
the four strategies' regexp projections over the pivoted body columns.

Scale notes: the pivot groupBy shuffles on seed_index — an evenly
distributed synthetic key, no skew; parse is pure Column expressions so
the whole projection stays in WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parse import parse_all
from ..schemas import PAGE_TYPES, RESULT_FIELDS


def barrier_join(fetched: DataFrame) -> DataFrame:
    """fetched(seed_index, page_type, body, ...) -> one row per complete
    fund context: (seed_index, body_OVERVIEW, ..., n_pages)."""
    return (
        fetched.groupBy("seed_index")
        .pivot("page_type", PAGE_TYPES)
        .agg(F.first("body"))
        .withColumn(
            "n_pages",
            sum(F.when(F.col(p).isNotNull(), 1).otherwise(0) for p in PAGE_TYPES),
        )
        # barrier: all 4 pages present (all_task_finished,
        # async_crawling_data.py:127-131)
        .filter(F.col("n_pages") == len(PAGE_TYPES))
    )


def assemble_results(fetched: DataFrame, seeds: DataFrame) -> DataFrame:
    """Complete contexts + seed metadata -> 12-column result table
    (RESULT_SCHEMA order). ``seeds`` is small relative to fetched pages
    -> broadcast side of the equi-join."""
    ctx = barrier_join(fetched)
    parsed_cols = parse_all({p: F.col(p) for p in PAGE_TYPES})
    joined = ctx.join(F.broadcast(seeds), "seed_index")
    return joined.select(
        F.col("fund_code"),
        F.col("fund_name").alias("fund_simple_name"),
        *[parsed_cols[f].alias(f) for f in RESULT_FIELDS if f not in ("fund_code", "fund_simple_name")],
    )


def to_csv_compat(result: DataFrame) -> DataFrame:
    """CSV-compat view: NULL -> literal 'None' string, exactly like the
    reference sink (save_result_2_file.py:12,28-29)."""
    return result.na.fill("None")
