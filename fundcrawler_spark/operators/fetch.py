"""Fetch kernel — applyInPandas batch fetcher over host-salt groups.

The reference fetches on a thread pool inside a child process
(http_request_downloader.py:116-175); our equivalent is one Arrow batch
per (host, host_salt) group handled by a Python worker. Grouping by
(host, host_salt) — not just host — is the skew fix: the eastmoney case
is ONE host owning the whole admitted set, and the salt fans its queue
across min(n_salts, executors) tasks while the AIMD budget still caps
total admission per host.

The transport is injected as a module-level callable name so the
closure stays picklable and tests/bench swap implementations without
touching the plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import FETCHED_SCHEMA


# Batch granularity for the fetch fan-out: the reference runs ~5 fetch
# threads per core inside its child process (cpu*5 task budget,
# rate_control.py:30), so ~5 rows per Spark task is the equivalent
# latency-hiding unit — finer only adds task-scheduling + Python-worker
# round-trips per wave.
FETCH_ROWS_PER_TASK = 5


def run_fetch(
    admitted: DataFrame,
    fail_rate: float = 0.0,
    max_fail_attempts: int = 3,
    wave: int | None = None,
    discover: bool = False,
    expected_rows: int | None = None,
) -> DataFrame:
    """admitted frontier rows -> FETCHED_SCHEMA rows (stub transport).
    ``wave`` stamps the rows with the wave the fetch HAPPENS in (the
    frontier row's own wave column is its enqueue wave).
    ``expected_rows``: caller's upper bound on the admitted count (the
    wave loop knows the per-host budgets); sizes the fan-out so a
    budget-bounded wave doesn't schedule 4x-cores mostly-empty
    applyInPandas tasks. None = unknown = assume big."""
    from ..sources.stub_transport import fetch_pandas_batch

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return fetch_pandas_batch(pdf, fail_rate, max_fail_attempts, discover)

    # Physical grouping is the kernel's own choice — politeness was
    # enforced upstream, so the fetch batches just need to be (a) even
    # and (b) plentiful. Two pitfalls this code avoids explicitly:
    #   * AQE coalesces shuffle partitions by BYTE size, but this
    #     stage's cost is python compute per row — a small admitted set
    #     would collapse to 1-2 partitions and run nearly serially; a
    #     user-specified repartition count is exempt from coalescing.
    #   * the frontier's host_salt has only n_salts values per host —
    #     hashing few group keys into many partitions leaves empty and
    #     double-loaded partitions (straggler tail), so the kernel
    #     re-salts finely off url_hash.
    spark = admitted.sparkSession
    parallelism = spark.sparkContext.defaultParallelism * 4
    if expected_rows is not None:
        parallelism = max(1, min(parallelism, -(-int(expected_rows) // FETCH_ROWS_PER_TASK)))
    fine = F.pmod(F.xxhash64("url_hash"), F.lit(parallelism * 16)).cast("int")
    # host_rank (admission rank from politeness.admit) rides through the
    # kernel when present so the crawl-order window downstream needs no
    # broadcast re-join of the admitted ranks (one fewer per-wave job)
    cols = [
        "url", "url_hash", "host", "host_salt", "page_type",
        "seed_index", "retry_count", "wave",
    ]
    if "host_rank" in admitted.columns:
        cols.append("host_rank")
    fetched = (
        admitted.select(*cols)
        .withColumn("fetch_salt", fine)
        .repartition(parallelism, "host", "fetch_salt")
        .groupBy("host", "fetch_salt")
        .applyInPandas(fn, FETCHED_SCHEMA)
    )
    if wave is not None:
        fetched = fetched.withColumn("wave", F.lit(wave).cast("int"))
    return fetched


def with_fetch_order(fetched: DataFrame, admitted_ranks: DataFrame, order_offset: int) -> DataFrame:
    """Assign the deterministic global crawl order: (host ASC, host_rank
    ASC) within the wave, continuing from ``order_offset``.

    The per-wave admitted set is budget-bounded (<= hosts x max_budget
    rows), so the single-partition ordering window is over a tiny set —
    this is control-plane-sized data, not the frontier.

    When ``fetched`` already carries ``host_rank`` (run_fetch passes it
    through the kernel), the window reads it directly; otherwise the
    ranks are broadcast-joined back from ``admitted_ranks``.
    """
    if "host_rank" in fetched.columns:
        ranked = fetched
    else:
        ranks = admitted_ranks.select("url_hash", "host_rank")
        ranked = fetched.join(F.broadcast(ranks), "url_hash")
    w = Window.orderBy(F.col("host").asc(), F.col("host_rank").asc())
    return (
        ranked
        .withColumn("fetch_order", F.row_number().over(w) + F.lit(order_offset))
        .drop("host_rank")
    )
