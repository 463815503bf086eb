"""Shared splitmix64 — THE single definition of the 64-bit finalizer.

Three kernels depend on bit-identical splitmix64 output (the seen-set
shard blobs, the MinHash coefficient streams, and the LSH band chains),
and each previously carried its own copy; golden tests pin the exact
bits, so drift between copies would desync engine vs simulator/oracle
silently. This module is the one implementation they all import.

Fixed constants, pure numpy uint64 wraparound arithmetic — no RNG
library, no version dependence.
"""

from __future__ import annotations

import numpy as np

MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
GOLDEN = 0x9E3779B97F4A7C15


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 'next' over uint64: add the golden-ratio
    increment, then the 3-step avalanche finalizer (wraparound is the
    defined semantics)."""
    x = (x + np.uint64(GOLDEN)) & MASK64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & MASK64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & MASK64
    return x ^ (x >> np.uint64(31))


def splitmix64_stream(n: int, salt: int = 0) -> list[int]:
    """First ``n`` outputs of a splitmix64 stream seeded at
    ``salt * GOLDEN``: element i equals splitmix64((salt + i) * GOLDEN)
    — identical bits to the classic scalar loop (state += GOLDEN,
    finalize), vectorized."""
    idx = (np.uint64(salt % (1 << 64)) + np.arange(n, dtype=np.uint64)) * np.uint64(GOLDEN)
    return [int(v) for v in splitmix64(idx & MASK64)]
