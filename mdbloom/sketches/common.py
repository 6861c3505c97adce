"""Shared vectorized hashing for sketch updates.

``hash64`` must be deterministic across processes, platforms, and sessions
(merge associativity and checkpoint-resume depend on it) and vectorized
(no per-row Python). We use ``pandas.util.hash_array`` — public pandas API,
C-implemented SipHash-2-4 for object/string arrays with a fixed embedded
key, and a deterministic integer scramble for numeric arrays — then mix
with SplitMix64 (Steele et al., public domain constant schedule) to derive
independent streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer — derives an independent-looking
    64-bit stream from another."""
    old = np.seterr(over="ignore")
    try:
        z = x.astype(np.uint64) + _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        return z ^ (z >> np.uint64(31))
    finally:
        np.seterr(**old)


def hash64(values, seed: int = 0) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a batch of values
    (strings, bytes, ints, floats). ``seed`` derives independent streams."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u", "f", "b", "M"):
        h = pd.util.hash_array(arr)
    else:
        h = pd.util.hash_array(arr.astype(object), categorize=True)
    if seed:
        old = np.seterr(over="ignore")
        try:
            h = splitmix64(h ^ np.uint64(seed))
        finally:
            np.seterr(**old)
    return h.astype(np.uint64)


def clz_tail(w: np.ndarray, width: int) -> np.ndarray:
    """Vectorized count of leading zeros within a ``width``-bit word held in
    a uint64 array (values < 2**width). Returns ``width`` for w == 0."""
    n = np.full(w.shape, width, dtype=np.int64)
    nz = w != 0
    if nz.any():
        # position of highest set bit via float64 exponent is unsafe >2^53;
        # use a 6-step binary search instead (SWAR, fully vectorized)
        x = w[nz].astype(np.uint64)
        msb = np.zeros(x.shape, dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            s = np.uint64(shift)
            big = x >= (np.uint64(1) << s)
            msb[big] += shift
            x = np.where(big, x >> s, x)
        n[nz] = width - 1 - msb
    return n
