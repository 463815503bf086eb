"""Temperature-scaled mixture sampling — the standard multilingual /
multi-source re-weighting step of training-data pipelines (mT5,
Conneau & Lample 2019; CCNet): sample group g with probability
proportional to count_g^(1/T), T >= 1, so low-resource groups are
up-weighted relative to their natural share without exploding the
budget.

Everything is deterministic integer math so a SQL oracle replays it
bit-exactly and a re-run samples the same ids:

- group weights w_g = isqrt^k(count_g) — T = 2^k via iterated integer
  square root (k=0: natural share; k=1: T=2, the common setting;
  k=2: T=4). Driver-side ``math.isqrt`` is mathematically exact;
  ``floor(sqrt())`` in the oracle agrees for any count < ~4.5e15
  (IEEE-correctly-rounded sqrt can only disagree with isqrt within
  half an ulp of an integer, which needs counts >= ~2^52).
- per-group keep threshold p_g = min(SCALE, SCALE * B * w_g /
  (sum_h w_h * count_g)) with integer div — expected sample size per
  group is ~B * w_g / sum_w, capped at the group's population.
- membership: keep row iff lehmer2(horner_hash(id)) % SCALE < p_g.
  horner_hash (not poly_hash: the linear weight ladder COLLIDES on
  numeric ids — 5,000 short keys collapse to ~460 hash values, so
  keep decisions would co-vary in ~10-key clumps and inflate sampling
  variance ~10x; Horner chaining is collision-free to birthday odds)
  gives distinct values, and two Lehmer rounds (h -> h*48271 %
  (2^31-1), the minstd step) spread the still-small-range hashes of
  short keys over the full 31-bit range with exact int64 math both
  engines can run. The sampled id SET (not just its size) is
  reproducible anywhere.

Scale shape: one tiny groupBy (|groups| rows) to the driver, weights
broadcast back, one hash filter — no shuffle of the data itself, no
window, survives 100 TB unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
_LEHMER_A = 48271
_LEHMER_P = 2_147_483_647


def lehmer2(h):
    """Two minstd multiplicative-congruential rounds over a Column (or
    plain int in tests). Domain/range [0, 2^31-1); intermediate
    products < 2^47 fit int64 exactly in Spark, DuckDB, and Python."""
    for _ in range(2):
        h = (h * _LEHMER_A) % _LEHMER_P
    return h


def lehmer2_sql(expr: str) -> str:
    return f"(({expr}) * {_LEHMER_A} % {_LEHMER_P} * {_LEHMER_A} % {_LEHMER_P})"


def mixture_thresholds(
    counts: dict[str, int], budget: int, isqrt_iters: int = 1
) -> dict[str, int]:
    """Pure-Python threshold computation (unit-testable without Spark).
    Returns per-group integer thresholds in [0, SCALE]."""
    weights = {}
    for g, c in counts.items():
        w = int(c)
        for _ in range(isqrt_iters):
            w = math.isqrt(w)
        weights[g] = w
    sum_w = sum(weights.values())
    if sum_w == 0:
        return {g: 0 for g in counts}
    return {
        g: min(SCALE, (SCALE * int(budget) * weights[g]) // (sum_w * counts[g]))
        if counts[g] > 0
        else 0
        for g in counts
    }


def mixture_sample(
    df: DataFrame,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    isqrt_iters: int = 1,
) -> DataFrame:
    """Sample ~``budget`` rows with group shares proportional to
    count^(1/2^isqrt_iters). Adds ``sample_threshold`` (the group's
    keep threshold out of SCALE) for downstream mixture reporting."""
    from .textstats import horner_hash

    counts = {
        r[group_col]: r["c"]
        for r in df.groupBy(group_col).agg(F.count("*").alias("c")).collect()
    }
    thr = mixture_thresholds(counts, budget, isqrt_iters)
    thr_df = df.sparkSession.createDataFrame(
        [(g, t) for g, t in thr.items()],
        f"{group_col} string, sample_threshold long",
    )
    key = F.concat(F.col(id_col).cast("string"), F.lit("|mix"))
    return (
        df.join(F.broadcast(thr_df), group_col)
        .filter(
            F.pmod(lehmer2(horner_hash(key)), F.lit(SCALE))
            < F.col("sample_threshold")
        )
    )
