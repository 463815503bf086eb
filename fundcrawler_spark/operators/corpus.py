"""Crawl→corpus gate pipeline — importable core of jobs/corpus_job.py
(moved into the package so the Structured Streaming ingest can run the
identical gates per micro-batch; batch and stream share ONE code path).

Stages (all DataFrame ops, zero per-row Python): SUCCESS+non-empty
filter → HTML main-text extraction → token/quality/language signals →
Gopher repetition gates (floored at 20 words) → exact dedup →
per-(source, lang, page_type) composition report.
"""

from __future__ import annotations


def build_corpus(spark, pages, min_tokens: int = 3,
                 max_top2: float = 0.20, max_dup5: float = 0.15,
                 rep_min_words: int = 20):
    """pages (FETCHED_SCHEMA-ish: url_hash/host/page_type/state/body)
    -> (corpus_df, composition_df, stats_dict). Importable so tests can
    drive it without spark-submit.

    The Gopher repetition gates only apply to docs with at least
    ``rep_min_words`` words: on a 5-word doc a single 2-gram covers
    ~half the characters by construction, so the fraction carries no
    repetition signal (Gopher pairs these thresholds with a 50-word
    minimum-length filter for the same reason — Rae et al. 2021
    §A1.1). Short docs still face ``min_tokens``."""
    from pyspark.sql import functions as F

    from fundcrawler_spark.functions.html import extract_html_text
    from fundcrawler_spark.operators.dedup import exact_dedup
    from fundcrawler_spark.operators.textstats import (
        lang_guess,
        quality_score,
        repetition_signals,
        token_count,
    )

    # the crawler's persisted pages table stores successes only (no
    # state column); raw FETCHED_SCHEMA frames still carry it — gate on
    # it only when present so both inputs work
    fetched = pages
    if "state" in pages.columns:
        fetched = fetched.filter(F.col("state") == "SUCCESS")
    fetched = fetched.filter(
        F.col("body").isNotNull() & (F.length("body") > 0)
    )
    docs = fetched.select(
        F.col("url_hash").alias("doc_id"),
        F.col("host").alias("source"),
        F.col("page_type"),
        extract_html_text(F.col("body")).alias("text"),
    )
    scored = docs.select(
        "*",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        lang_guess(F.col("text")).alias("lang"),
    )
    rep = repetition_signals(docs).select(
        "doc_id", "n_words", "top_2gram_char_frac", "dup_5gram_char_frac"
    )
    rep_applies = F.col("n_words") >= rep_min_words
    gated = (
        scored.join(rep, "doc_id")
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (~rep_applies | (F.col("top_2gram_char_frac") <= max_top2))
            & (~rep_applies | (F.col("dup_5gram_char_frac") <= max_dup5))
        )
        .drop("n_words")
    )
    keepers = exact_dedup(gated, id_col="doc_id", text_col="text").select(
        F.col("keeper_id").alias("doc_id"), "n_copies"
    )
    corpus = gated.join(keepers, "doc_id")

    cells = corpus.groupBy("source", "lang", "page_type").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    tot = cells.agg(F.sum("n_tokens").alias("total_tokens"))
    composition = cells.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "page_type",
        "n_docs",
        "n_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.greatest(F.col("total_tokens"), F.lit(1).cast("long"))
        ).alias("token_share"),
    )

    n_fetched = fetched.count()
    n_gated = gated.count()
    n_corpus = corpus.count()
    stats = {
        "pages_success": n_fetched,
        "docs_after_quality_gate": n_gated,
        "docs_after_dedup": n_corpus,
        "dropped_by_gate": n_fetched - n_gated,
        "dropped_as_duplicates": n_gated - n_corpus,
    }
    return corpus, composition, stats
