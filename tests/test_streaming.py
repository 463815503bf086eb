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
