"""Structured Streaming surface — the streaming analog of the
reference's rate-control telemetry loop (rate_control.py analyse-mode
rows + the 10-wave sliding fail window).

The crawl itself is a deterministic wave loop (SURVEY.md §2.8: the
reference is a bounded pipelined stream, not event-time streaming), so
Structured Streaming here covers the genuinely streaming piece: a
continuous fetch-event feed aggregated into per-host windowed fail
rates with watermarked late-data handling, plus a foreachBatch sink
that appends to the IcebergLite metrics table.

``fetch_events_from_rate_source`` turns the built-in rate source into
a deterministic synthetic fetch-event stream so tests can run with
``trigger(availableNow=True)`` and no network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fetch_events_from_rate_source(
    spark: SparkSession, rows_per_second: int = 1000, n_hosts: int = 4
) -> DataFrame:
    """Streaming DF of (ts, host, state) synthesized from the rate
    source — deterministic in `value`, so every micro-batch run yields
    the same event for the same value."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return raw.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("h"), (F.col("value") % n_hosts).cast("string")).alias("host"),
        F.when(F.col("value") % 10 < 2, F.lit("FALSE")).otherwise(F.lit("SUCCESS")).alias("state"),
    )


def windowed_fail_rate(
    events: DataFrame, window: str = "10 seconds", slide: str = "5 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Per-host sliding-window fail rate with late-data watermark — the
    event-time generalization of the reference's mod-10 ring buffer."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "host")
        .agg(
            F.count_if(F.col("state") == "FALSE").alias("n_fail"),
            F.count("*").alias("n_total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fail",
            "n_total",
            (F.col("n_fail") / F.col("n_total")).alias("fail_rate"),
        )
    )


def run_metrics_stream(
    spark: SparkSession,
    sink_dir: str,
    rows_per_second: int = 1000,
    available_now: bool = True,
):
    """Wire the stream to a parquet sink via foreachBatch (the pattern
    that would append to the Iceberg metrics table on a real cluster).
    With ``available_now`` the query drains what the source has and
    stops — the bounded-test mode."""
    events = fetch_events_from_rate_source(spark, rows_per_second)
    agg = windowed_fail_rate(events)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(sink_dir)

    writer = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", sink_dir + "_ckpt")
        .foreachBatch(sink)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="5 seconds").start()
    return q


def streaming_url_dedup(urls: DataFrame, watermark: str = "30 seconds") -> DataFrame:
    """Exactly-once URL admission for a CONTINUOUS discovery feed — the
    streaming analog of the wave loop's seen-set anti-join: canonicalize
    -> xxhash64 -> dropDuplicatesWithinWatermark(url_hash). State is the
    per-key dedup store bounded by the watermark horizon (the batch
    engine's bloom shards are the unbounded-horizon variant; a real
    deployment composes both: in-horizon exact dedup here, historical
    membership via the sharded filters)."""
    from ..functions.urlnorm import canonicalize_url, url_hash, url_host

    return (
        urls.withColumn("url_norm", canonicalize_url(F.col("url")))
        .withColumn("url_hash", url_hash(F.col("url_norm")))
        .withColumn("host", url_host(F.col("url_norm")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )
