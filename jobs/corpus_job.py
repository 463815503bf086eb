"""spark-submit entry point for the crawl→corpus pipeline: turn a
finished crawl's pages table into a filtered, deduplicated training
corpus plus a composition report — the end-to-end bridge between the
engine's two halves.

    make dist
    spark-submit --py-files dist/fundcrawler_spark.zip \
        jobs/corpus_job.py --crawl-workdir /tmp/crawl --out /tmp/corpus

Stages (all DataFrame ops, zero per-row Python):
  1. pages scan        — IcebergLite read, SUCCESS + non-empty body only
  2. text extraction   — functions/html.extract_html_text (codegen'd
                         regexp chain) inside the scan projection
  3. per-doc signals   — token count, quality score, language guess,
                         Gopher repetition fractions (textstats)
  4. quality gate      — min tokens, Gopher top-2-gram <= 0.20 and
                         dup-5-gram <= 0.15 thresholds (Rae et al. 2021)
  5. exact dedup       — md5 digest groupBy, keeper = min doc_id
  6. outputs           — corpus parquet (kept docs), composition
                         parquet (per source x lang x page_type token
                         shares), one JSON stats line on stdout

100-TB shape: stages 1-4 are a single scan projection + filter (no
shuffle); stage 5 is one hash groupBy on the digest; the composition
is a bounded-cardinality aggregate with a broadcast 1-row total. The
only wide ops are the dedup groupBy and the semi-join bringing keeper
rows back — both keyed, both AQE-skew-safe.
"""

from __future__ import annotations

import argparse
import json
import os


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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-workdir", required=True,
                    help="workdir of a finished jobs/crawl_job.py run")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-tokens", type=int, default=3)
    ap.add_argument("--max-top2gram", type=float, default=0.20)
    ap.add_argument("--max-dup5gram", type=float, default=0.15)
    ap.add_argument(
        "--since-snapshot", type=int, default=None,
        help="incremental refresh: only pages appended after this "
             "pages-table snapshot id (from a previous run's "
             "pages_snapshot output) are processed",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fundcrawler_spark.sources.iceberg_lite import IcebergLiteTable

    spark = SparkSession.builder.appName("fundcrawler-corpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    tbl = IcebergLiteTable(os.path.join(args.crawl_workdir, "tables", "pages"))
    if args.since_snapshot is not None:
        pages = tbl.read_incremental(spark, since=args.since_snapshot)
        if pages is None:
            print(json.dumps({"docs": 0, "note": "no new pages",
                              "pages_snapshot": tbl.current_snapshot()}))
            spark.stop()
            return
    else:
        pages = tbl.read(spark)
    if pages is None:
        raise SystemExit(f"no pages table under {args.crawl_workdir}")

    corpus, composition, stats = build_corpus(
        spark, pages, args.min_tokens, args.max_top2gram, args.max_dup5gram
    )
    stats["pages_snapshot"] = tbl.current_snapshot()
    corpus.write.mode("overwrite").parquet(os.path.join(args.out, "corpus"))
    composition.write.mode("overwrite").parquet(
        os.path.join(args.out, "composition")
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
