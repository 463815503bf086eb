"""Int64 3-gram encoding (r7 verify-stage optimization): the encoded
distinct-gram sets must be an injective image of the string sets, so
every |A|, |B|, |A ∩ B| — and therefore every verify jaccard — is
EXACTLY what the string-gram scan (and the DuckDB oracle) computes.
"""

from __future__ import annotations

import numpy as np

from fundcrawler_spark.operators.dedup import _gram3_encode_py, _gram3_sets


def _ref_set(t: str) -> set[str]:
    return {t[j : j + 3] for j in range(max(len(t) - 2, 1))}


CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcabcabc",
    "the quick brown fox jumps over the lazy dog",
    "中文无空格的长串字符测试中文无空格",
    "mixed 中英 text with spaces",
    "aaaaaaa",
    "ab\x00cd\x00",  # NUL inside text: per-doc exact fallback path
    "\x00\x00\x00",
    "x\ny\tz  w",
    "🚀🚀 emoji pair 🚀",  # astral plane codepoints (> 0xFFFF)
    "\U0010ffffzz\U0010ffff",  # max codepoint
]


def test_encoding_injective_on_all_grams():
    grams = set()
    for t in CASES:
        grams |= _ref_set(t)
    encoded = {g: _gram3_encode_py(g) for g in grams}
    assert len(set(encoded.values())) == len(encoded), "encoding collided"
    # int64-positive range (the kernel stores these as spark longs)
    assert all(0 <= v < 2**63 for v in encoded.values())


def test_gram3_sets_equal_string_reference():
    got = _gram3_sets(CASES)
    for t, enc in zip(CASES, got):
        want = sorted(_gram3_encode_py(g) for g in _ref_set(t))
        assert list(enc) == want, t


def test_gram3_sets_jaccard_matches_string_jaccard():
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "中文", "测试"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 30)).tolist())
        for _ in range(100)
    ]
    enc = _gram3_sets(texts)
    for i in range(0, 100, 7):
        for j in range(i + 1, 100, 13):
            a, b = _ref_set(texts[i]), _ref_set(texts[j])
            want = len(a & b) / (len(a) + len(b) - len(a & b))
            ea, eb = set(enc[i].tolist()), set(enc[j].tolist())
            got = len(ea & eb) / (len(ea) + len(eb) - len(ea & eb))
            assert got == want
