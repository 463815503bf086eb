"""Structured Streaming corpus ingest — the streaming twin of
jobs/corpus_job.py for a crawl that never stops appending.

A file-source stream watches a pages directory (in production: the
crawl's landing zone); each micro-batch runs the IDENTICAL batch gate
pipeline (`operators/corpus.build_corpus` — one code path, so batch
and stream can never drift) and appends only genuinely new documents
to an IcebergLite corpus table:

- within-batch dedup comes from build_corpus's exact_dedup;
- cross-batch exactly-once comes from an anti-join of the batch's
  text digests against the digests already committed to the table —
  a re-crawled or re-delivered page is dropped no matter which
  micro-batch it arrives in;
- the file-source checkpoint makes file delivery itself exactly-once
  across restarts.

100-TB shape: the anti-join is keyed by a 128-bit digest (no text
shuffle — digests only); at a corpus too large to scan per batch the
digest column is exactly what the crawl's bloom seen-set machinery
(operators/seen.py) already shards, and the same table swap applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.corpus import build_corpus
from ..sources.iceberg_lite import IcebergLiteTable


def _digest(col):
    return F.md5(F.col(col).cast("binary"))


def start_corpus_ingest(
    spark: SparkSession,
    pages_dir: str,
    pages_schema: StructType,
    corpus_table: IcebergLiteTable,
    checkpoint_dir: str,
    min_tokens: int = 3,
    max_top2: float = 0.20,
    max_dup5: float = 0.15,
    available_now: bool = True,
):
    """Start (and return) the streaming query. With
    ``available_now=True`` it drains every unprocessed file then stops
    — call repeatedly as new files land (tests do exactly this); with
    False it runs continuously."""
    stream = (
        spark.readStream.schema(pages_schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        corpus, _, _ = build_corpus(
            batch_df.sparkSession, batch_df, min_tokens, max_top2, max_dup5
        )
        corpus = corpus.withColumn("digest", _digest("text"))
        existing = corpus_table.read(batch_df.sparkSession)
        if existing is not None:
            corpus = corpus.join(
                existing.select("digest").distinct(), "digest", "left_anti"
            )
        # two batch-internal rows can share a digest only via distinct
        # doc_ids (exact_dedup already collapsed same-text copies to
        # one keeper), so no within-frame dedup is needed here
        rows = corpus.count()
        if rows:
            corpus_table.append(corpus)

    trigger = {"availableNow": True} if available_now else {"processingTime": "10 seconds"}
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
