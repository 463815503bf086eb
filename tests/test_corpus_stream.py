"""Streaming corpus ingest (streaming/corpus_stream.py): each
micro-batch runs the SAME build_corpus gates, appends are exactly-once
across batches and restarts."""

import os
import tempfile

from pyspark.sql import functions as F

from fundcrawler_spark.operators.corpus import build_corpus
from fundcrawler_spark.sources.iceberg_lite import IcebergLiteTable
from fundcrawler_spark.streaming.corpus_stream import start_corpus_ingest

PAGES_DDL = (
    "url_hash long, host string, page_type string, state string, body string"
)


def _page(i, body, state="SUCCESS"):
    return (i, "h", "OVERVIEW", state, body)


def _write_batch(spark, pages_dir, rows, name):
    df = spark.createDataFrame(rows, PAGES_DDL)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(pages_dir, name)
    )


def _drain(spark, pages_dir, table, ckpt):
    schema = spark.createDataFrame([], PAGES_DDL).schema
    q = start_corpus_ingest(
        spark, pages_dir + "/*", schema, table, ckpt, available_now=True
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_equals_batch_and_is_exactly_once(spark):
    batch1 = [
        _page(1, "<p>alpha beta gamma delta epsilon zeta</p>"),
        _page(2, "<p>alpha beta gamma delta epsilon zeta</p>"),  # dup of 1
        _page(3, "<p>hi</p>"),  # min-tokens drop
        _page(4, "<p>quick brown fox jumps over lazy dog now</p>"),
    ]
    batch2 = [
        _page(5, "<p>alpha beta gamma delta epsilon zeta</p>"),  # cross-batch dup
        _page(6, "<p>seven distinct words appear in this body</p>"),
        _page(7, "<p>never fetched</p>", state="FALSE"),
    ]
    with tempfile.TemporaryDirectory() as d:
        pages_dir, ckpt = d + "/pages", d + "/ckpt"
        os.makedirs(pages_dir)
        table = IcebergLiteTable(d + "/corpus")

        _write_batch(spark, pages_dir, batch1, "b1")
        _drain(spark, pages_dir, table, ckpt)
        got1 = {r["doc_id"] for r in table.read(spark).collect()}
        assert got1 == {1, 4}

        _write_batch(spark, pages_dir, batch2, "b2")
        _drain(spark, pages_dir, table, ckpt)
        rows = table.read(spark).collect()
        got2 = {r["doc_id"] for r in rows}
        # 5's text digest already committed in batch 1 -> dropped
        assert got2 == {1, 4, 6}
        assert len(rows) == 3  # no duplicate appends anywhere

        # stream result == batch build_corpus doc set over ALL pages
        # (modulo keeper choice for the cross-batch duplicate, which
        # the stream resolves by arrival order: 1 arrived before 5)
        all_pages = spark.createDataFrame(batch1 + batch2, PAGES_DDL)
        bcorpus, _, _ = build_corpus(spark, all_pages)
        btexts = {r["text"] for r in bcorpus.collect()}
        assert {r["text"] for r in rows} == btexts

        # a third drain with nothing new appends nothing (checkpoint
        # makes file delivery exactly-once across restarts)
        snap_before = table.current_snapshot()
        _drain(spark, pages_dir, table, ckpt)
        assert table.current_snapshot() == snap_before


def test_stream_batches_carry_gate_semantics(spark):
    """The Gopher repetition gate fires inside a micro-batch exactly
    as in batch mode."""
    with tempfile.TemporaryDirectory() as d:
        pages_dir, ckpt = d + "/pages", d + "/ckpt"
        os.makedirs(pages_dir)
        table = IcebergLiteTable(d + "/corpus")
        bomb = "<p>" + " ".join(["go"] * 24) + "</p>"
        _write_batch(
            spark,
            pages_dir,
            [_page(1, bomb), _page(2, "<p>one two three four five six</p>")],
            "b1",
        )
        _drain(spark, pages_dir, table, ckpt)
        assert {r["doc_id"] for r in table.read(spark).collect()} == {2}
