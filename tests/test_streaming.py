"""Structured Streaming surface: rate-source fetch events -> windowed
fail rate with watermark -> foreachBatch parquet sink, drained with
availableNow (bounded, offline)."""

import glob
import shutil
import tempfile
import time

from fundcrawler_spark.streaming.metrics_stream import run_metrics_stream


def test_metrics_stream_available_now(spark):
    d = tempfile.mkdtemp(prefix="stream_")
    try:
        q = run_metrics_stream(spark, d + "/out", rows_per_second=500, available_now=True)
        # rate source needs a moment to have data; availableNow drains it
        q.awaitTermination(60)
        time.sleep(0.5)
        files = glob.glob(d + "/out/*.parquet")
        if files:
            df = spark.read.parquet(d + "/out")
            rows = df.collect()
            for r in rows:
                assert 0.0 <= r["fail_rate"] <= 1.0
                assert r["n_total"] >= r["n_fail"]
        # no assertion on row count: availableNow may drain before the
        # first window closes; the contract here is clean start/stop
        # with watermarked append mode and a working foreachBatch sink
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_url_dedup_exactly_once(spark):
    """File-source stream with duplicated URLs (aliases differing only
    in case/default-port/trailing junk) -> dedup emits each canonical
    URL exactly once."""
    from pyspark.sql import functions as F

    from fundcrawler_spark.streaming.metrics_stream import streaming_url_dedup

    d = tempfile.mkdtemp(prefix="sdedup_")
    try:
        base = spark.range(0, 300).select(
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
            F.concat(F.lit("https://host"), (F.col("id") % 7).cast("string"),
                     F.lit(".example.com/p/"), (F.col("id") % 100).cast("string")).alias("url"),
        )
        # alias duplicates that canonicalize identically: WWW. + host
        # case + default port + https + duplicate slashes + trailing /
        alias = base.withColumn(
            "url",
            F.regexp_replace(
                F.regexp_replace(F.col("url"), "https://host", "HTTP://WWW.HOST"),
                r"/p/", "//p//",
            ),
        ).withColumn("url", F.concat(F.col("url"), F.lit("/")))
        base.unionByName(alias).write.parquet(d + "/in")
        stream = spark.readStream.schema("ts timestamp, url string").parquet(d + "/in")
        out = streaming_url_dedup(stream)
        q = (
            out.writeStream.outputMode("append")
            .option("checkpointLocation", d + "/ckpt")
            .format("parquet")
            .option("path", d + "/out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(d + "/out")
        hashes = [r["url_hash"] for r in got.select("url_hash").collect()]
        assert len(hashes) == len(set(hashes)), "duplicates emitted"
        # 100 distinct canonical urls (id%100 x 7 hosts -> id%700 cycle of 300 -> 300 distinct? )
        n_expect = base.select(F.lower("url")).distinct().count()
        assert len(hashes) == n_expect
    finally:
        shutil.rmtree(d, ignore_errors=True)
