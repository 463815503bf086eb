"""AIMD rate control as a custom stateful streaming operator.

The reference's RateControl is a mutable ring-buffer aggregate updated
once per poll wave (rate_control.py:49-82). In Structured Streaming
that is exactly a per-key (per-host) state machine: each micro-batch's
fetch events for a host are one "wave"; the state carries the rings +
threshold; the output stream is the budget decision per wave —
implemented with ``applyInPandasWithState`` (SURVEY.md §2.8).

The update math delegates to plans.rate_control.HostRate, so the
streaming operator and the wave-loop control plane share one
implementation of the reference formula.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.rate_control import RING, HostRate

STATE_SCHEMA = T.StructType([
    T.StructField("cur", T.DoubleType()),
    T.StructField("last", T.DoubleType()),
    T.StructField("fail_has_recover", T.BooleanType()),
    T.StructField("iterations", T.LongType()),
    T.StructField("success_ring", T.ArrayType(T.LongType())),
    T.StructField("fail_ring", T.ArrayType(T.LongType())),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("iteration", T.LongType()),
    T.StructField("n_success", T.LongType()),
    T.StructField("n_fail", T.LongType()),
    T.StructField("budget", T.IntegerType()),
    T.StructField("cur", T.DoubleType()),
    T.StructField("threshold", T.DoubleType()),
])


def _update(key, pdf_iter, state: GroupState):
    host = key[0]
    n_success = n_fail = 0
    for pdf in pdf_iter:
        n_success += int((pdf["state"] == "SUCCESS").sum())
        n_fail += int((pdf["state"] == "FALSE").sum())

    if state.exists:
        cur, last, rec, iters, sring, fring = state.get
        rate = HostRate(
            max_num=160.0, cur=cur, last=last, fail_has_recover=rec,
            iterations=int(iters), success_ring=list(sring), fail_ring=list(fring),
        )
    else:
        rate = HostRate(max_num=160.0)

    iteration = rate.iterations
    budget = rate.update(n_success, n_fail)
    state.update((
        rate.cur, rate.last, rate.fail_has_recover, rate.iterations,
        [int(x) for x in rate.success_ring], [int(x) for x in rate.fail_ring],
    ))
    yield pd.DataFrame({
        "host": [host],
        "iteration": [iteration],
        "n_success": [n_success],
        "n_fail": [n_fail],
        "budget": [budget],
        "cur": [rate.cur],
        "threshold": [rate.last],
    })


def streaming_budgets(events: DataFrame) -> DataFrame:
    """events(host, state) stream -> per-micro-batch AIMD budget stream."""
    return (
        events.groupBy("host")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_budget_stream(spark, sink_dir: str, rows_per_batch: int = 200,
                      n_hosts: int = 3, fail_every: int = 10):
    """Deterministic rate-micro-batch source -> stateful AIMD budgets
    -> parquet sink. Returns the StreamingQuery (caller stops it)."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    events = raw.select(
        F.concat(F.lit("h"), (F.col("value") % n_hosts).cast("string")).alias("host"),
        F.when(F.col("value") % fail_every == 0, F.lit("FALSE"))
        .otherwise(F.lit("SUCCESS"))
        .alias("state"),
    )
    budgets = streaming_budgets(events)
    return (
        budgets.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", sink_dir + "_ckpt")
        .trigger(processingTime="1 second")
        .start()
    )
