"""End-to-end crawl→corpus pipeline (jobs/corpus_job.build_corpus):
a real small crawl's pages table through HTML extraction, quality +
Gopher gates, exact dedup, and the composition report."""

import shutil
import tempfile

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.plans.wave_loop import Crawler, CrawlConfig
from fundcrawler_spark.schemas import SEEDS_SCHEMA
from jobs.corpus_job import build_corpus


def test_corpus_job_end_to_end(spark):
    seeds = spark.createDataFrame(fx.seed_rows(8), SEEDS_SCHEMA)
    wd = tempfile.mkdtemp(prefix="corpus_")
    try:
        c = Crawler(spark, wd, CrawlConfig(fail_rate=0.0, max_waves=25))
        stats = c.run(seeds=seeds, log=lambda *a: None)
        assert stats["pages_fetched"] == 32  # 8 seeds x 4 pages

        pages = c.pages.read(spark)
        corpus, composition, jstats = build_corpus(spark, pages)

        # counts are coherent and nothing was silently dropped
        assert jstats["pages_success"] == 32
        assert (
            jstats["docs_after_quality_gate"]
            == jstats["pages_success"] - jstats["dropped_by_gate"]
        )
        assert (
            jstats["docs_after_dedup"]
            == jstats["docs_after_quality_gate"]
            - jstats["dropped_as_duplicates"]
        )
        rows = corpus.collect()
        assert len(rows) == jstats["docs_after_dedup"] > 0

        # extraction really ran: no markup survives, entities decoded
        for r in rows:
            assert "<html>" not in r["text"] and "</p>" not in r["text"]
            assert r["n_tokens"] >= 3
            # repetition gates apply only at >= rep_min_words (20);
            # these fixture pages are short, so they pass via the floor
            if r["n_tokens"] >= 20:
                assert r["top_2gram_char_frac"] <= 0.20
                assert r["dup_5gram_char_frac"] <= 0.15
            assert r["n_copies"] >= 1

        # dedup keeps exactly one row per distinct text, keeper = min id
        texts = [r["text"] for r in rows]
        assert len(texts) == len(set(texts))
        # the persisted pages table stores successes only
        by_text = pages.select("url_hash", "body").collect()
        # composition: shares sum to 1 over the kept corpus
        comp = composition.collect()
        assert abs(sum(r["token_share"] for r in comp) - 1.0) < 1e-12
        assert sum(r["n_docs"] for r in comp) == len(rows)
        assert {r["source"] for r in comp} == {fx.EASTMONEY_HOST}
        assert len(by_text) == 32
    finally:
        shutil.rmtree(wd)


def test_corpus_job_gates_and_dedup_fire(spark):
    """Planted inputs: an exact duplicate pair, a repetition bomb, and
    a too-short doc — each dropped by the right stage."""
    rows = [
        # (url_hash, host, page_type, state, body)
        (1, "h", "OVERVIEW", "SUCCESS", "<p>alpha beta gamma delta epsilon zeta</p>"),
        (2, "h", "OVERVIEW", "SUCCESS", "<p>alpha beta gamma delta epsilon zeta</p>"),
        (3, "h", "MANAGER", "SUCCESS", "<p>" + " ".join(["go"] * 24) + "</p>"),
        (4, "h", "MANAGER", "SUCCESS", "<p>hi</p>"),
        (5, "h", "METRICS", "SUCCESS", "<p>quick brown fox jumps over lazy dog now</p>"),
        (6, "h", "METRICS", "FALSE", "<p>never fetched ok body text here</p>"),
        (7, "h", "METRICS", "SUCCESS", None),
    ]
    pages = spark.createDataFrame(
        rows,
        "url_hash long, host string, page_type string, state string, body string",
    )
    corpus, composition, stats = build_corpus(spark, pages)
    got = {r["doc_id"]: r for r in corpus.collect()}
    # 6 dropped (state), 7 dropped (null body) -> 5 success
    assert stats["pages_success"] == 5
    # 3 (24 'go's, above the 20-word repetition floor) dropped by the
    # Gopher top-2-gram gate, 4 by min tokens -> 3 gated
    assert stats["docs_after_quality_gate"] == 3
    assert stats["dropped_by_gate"] == 2
    # 2 is an exact duplicate of 1 -> keeper is min id
    assert stats["dropped_as_duplicates"] == 1
    assert set(got) == {1, 5}
    assert got[1]["n_copies"] == 2 and got[5]["n_copies"] == 1
    assert got[1]["text"] == "alpha beta gamma delta epsilon zeta"
