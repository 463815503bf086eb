"""Temperature-scaled mixture sampling (operators/sampling.py)."""

import math

from fundcrawler_spark.operators.sampling import (
    SCALE,
    lehmer2,
    mixture_sample,
    mixture_thresholds,
)


def test_thresholds_hit_budget_in_expectation():
    counts = {"en": 10_000, "zh": 2_500, "mi": 100}
    thr = mixture_thresholds(counts, budget=1_000, isqrt_iters=1)
    expected = sum(thr[g] * counts[g] / SCALE for g in counts)
    assert abs(expected - 1_000) < 5  # integer-div rounding only


def test_temperature_flattens_shares():
    """T=2 (isqrt once) must give the low-resource group a LARGER
    share of the sample than its natural share, without exceeding the
    high-resource group's."""
    counts = {"hi": 90_000, "lo": 10_000}
    nat = mixture_thresholds(counts, budget=10_000, isqrt_iters=0)
    t2 = mixture_thresholds(counts, budget=10_000, isqrt_iters=0 + 1)

    def share(thr, g):
        tot = sum(thr[h] * counts[h] for h in counts)
        return thr[g] * counts[g] / tot

    assert share(t2, "lo") > share(nat, "lo")
    assert share(t2, "lo") < 0.5  # still fewer than the big group


def test_threshold_caps_at_scale():
    thr = mixture_thresholds({"a": 10, "b": 100_000}, budget=99_999)
    assert thr["a"] == SCALE  # tiny group fully kept


def test_zero_and_empty_groups():
    assert mixture_thresholds({}, 10) == {}
    assert mixture_thresholds({"a": 0}, 10) == {"a": 0}


def test_lehmer2_spreads_short_key_hashes():
    """Raw poly hashes of short ids live in [0, ~1e5] — below SCALE.
    After two Lehmer rounds the values must cover the full range and
    keep a uniform-ish low/high split (this is the bug the scramble
    exists to prevent: without it EVERY row passes any threshold
    above ~1e5)."""
    from fundcrawler_spark.operators.textstats import P31

    raws = []
    for i in range(5_000):
        s = f"{i}|mix"
        raws.append(
            sum(ord(c) * ((k + 1) * 31) for k, c in enumerate(s)) % P31
        )
    assert max(raws) < SCALE  # the raw hash really is degenerate
    mixed = [lehmer2(h) % SCALE for h in raws]
    frac = sum(1 for m in mixed if m < SCALE // 2) / len(mixed)
    assert 0.45 < frac < 0.55
    assert max(mixed) > 0.99 * SCALE


def test_mixture_sample_spark_matches_pure_python(spark):
    from fundcrawler_spark.operators.textstats import P31

    rows = [(i, "en" if i % 5 else "mi") for i in range(1_000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    counts = {"en": 800, "mi": 200}
    thr = mixture_thresholds(counts, budget=300, isqrt_iters=1)

    def keep(i, lang):
        h = 0
        for c in f"{i}|mix":
            h = (h * 131 + ord(c)) % P31
        return lehmer2(h) % SCALE < thr[lang]

    want = sorted(i for i, lang in rows if keep(i, lang))
    got = sorted(
        r["doc_id"]
        for r in mixture_sample(df, budget=300, isqrt_iters=1).collect()
    )
    assert got == want
    assert abs(len(got) - 300) < 60  # ~budget


def test_mixture_sample_deterministic_under_repartition(spark):
    rows = [(i, ["en", "zh", "fr"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = sorted(r["doc_id"] for r in mixture_sample(df, 100).collect())
    b = sorted(
        r["doc_id"] for r in mixture_sample(df.repartition(7), 100).collect()
    )
    assert a == b
