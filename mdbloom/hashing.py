"""Token hashing: 128-bit digest -> enhanced double hashing.

The reference uses commons-collections4 ``DynamicHasher`` with
MurmurHash3-x64-128 in "cyclic" (K-M) mode: per property value compute
(h1, h2), then bit_i = (h1 + i*h2) wrapped mod 2^64 then mod m (public
commons-collections4 contract, pinned at reference `pom.xml:26-30`; usage
`ContainerImplTest.java:50,79-83`). Exact Java-hash equality is NOT a goal
(SURVEY §1.3) — the double-hashing scheme family, the (m, k) math, and
therefore the FPR bounds are.

Plain K-M over a *composite* m has a known structural weakness we measured
here before adopting it: positions live in the coset ``h1 + <gcd(step, m)>``
(e.g. with m=94 and an even h2, only the 47 odd bits are reachable, and two
unrelated tokens can share ~all their bits). We therefore use the published
fix — Dillinger & Manolios *enhanced double hashing* (SPIN 2004):

    bit_i = ( h1 + i*h2 + (i^3 - i)/6 ) mod m

whose triangular accumulator breaks coset structure for composite m while
preserving the two-hash economy and the standard Bloom FPR analysis.

(h1, h2) come from ``md5(token_bytes)`` (two little-endian uint64 halves):
C-speed via hashlib, deterministic across platforms/versions, trivially
reproducible in any oracle. Hot paths hash only *unique* tokens
(vocabulary-sized work) and fan results back out with vectorized gathers.
"""

from __future__ import annotations

import hashlib

import numpy as np

from mdbloom import bits as B
from mdbloom.shape import Shape

_U64_MASK = (1 << 64) - 1


def token_hash_pair(token) -> tuple[int, int]:
    """(h1, h2) for one token. Accepts str or bytes."""
    if isinstance(token, str):
        token = token.encode("utf-8")
    d = hashlib.md5(token).digest()
    return (int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little"))


def _tetrahedral(k: int) -> np.ndarray:
    """(i^3 - i) / 6 for i = 0..k-1 — the enhanced-double-hashing term."""
    i = np.arange(k, dtype=np.int64)
    return (i * i * i - i) // 6


def km_bit_positions(h1: int, h2: int, shape: Shape) -> np.ndarray:
    """k bit positions from one (h1, h2) pair via enhanced double hashing:
    (h1 + i*h2 + (i^3-i)/6) mod m, computed in exact integer arithmetic."""
    m = shape.m
    i = np.arange(shape.k, dtype=np.int64)
    a = (h1 & _U64_MASK) % m
    b = (h2 & _U64_MASK) % m
    return (a + i * b + _tetrahedral(shape.k)) % m


def km_positions_matrix(h1s: np.ndarray, h2s: np.ndarray, shape: Shape) -> np.ndarray:
    """(U,) h1 and h2 -> (U, k) bit positions, fully vectorized enhanced
    double hashing in exact int64 arithmetic (mods taken early so the
    products stay tiny: i*(h2 mod m) <= k*m)."""
    m = np.int64(shape.m)
    i = np.arange(shape.k, dtype=np.int64)[None, :]
    a = (h1s.astype(np.uint64) % np.uint64(shape.m)).astype(np.int64)[:, None]
    b = (h2s.astype(np.uint64) % np.uint64(shape.m)).astype(np.int64)[:, None]
    tet = _tetrahedral(shape.k)[None, :] % m
    return (a + (i * b) % m + tet) % m


def hash_unique_tokens(tokens) -> tuple[np.ndarray, np.ndarray]:
    """md5 each (unique) token -> (h1s, h2s) uint64 arrays.

    Python loop is over UNIQUE tokens only — callers dedup first, so this
    is vocabulary-sized, not corpus-sized."""
    n = len(tokens)
    h1s = np.empty(n, dtype=np.uint64)
    h2s = np.empty(n, dtype=np.uint64)
    for j, tok in enumerate(tokens):
        if isinstance(tok, str):
            tok = tok.encode("utf-8")
        d = hashlib.md5(tok).digest()
        h1s[j] = int.from_bytes(d[:8], "little")
        h2s[j] = int.from_bytes(d[8:], "little")
    return h1s, h2s


class TokenMaskCache:
    """token -> packed per-token filter mask (uint64[W]) with memoization.

    One mask per distinct token per Shape; record filters are ORs of their
    tokens' masks (the Spark build path fans these out with
    ``np.bitwise_or.reduceat``)."""

    # cap memoization so open vocabularies (ids, hashes) can't grow a
    # worker-resident cache unboundedly; vocabulary-like corpora never hit it
    MAX_ENTRIES = 1 << 20

    def __init__(self, shape: Shape, max_entries: int | None = None):
        self.shape = shape
        self.max_entries = max_entries or self.MAX_ENTRIES
        self._cache: dict = {}

    def masks_for(self, tokens: np.ndarray) -> np.ndarray:
        """(T,) object array of tokens -> (T, W) packed masks, memoized on
        unique tokens."""
        uniq, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
        if len(self._cache) + len(uniq) > self.max_entries:
            self._cache.clear()
        missing = [t for t in uniq if t not in self._cache]
        if missing:
            h1s, h2s = hash_unique_tokens(missing)
            pos = km_positions_matrix(h1s, h2s, self.shape)
            new_masks = B.masks_from_positions(pos, self.shape.m)
            for t, mrow in zip(missing, new_masks):
                self._cache[t] = mrow
        uniq_masks = np.stack([self._cache[t] for t in uniq]) if len(uniq) else \
            B.zeros(self.shape.m, 0)
        return uniq_masks[inv]

    def filter_for(self, tokens) -> np.ndarray:
        """Single record: OR of all its tokens' masks (empty -> zero filter)."""
        if len(tokens) == 0:
            return B.zeros(self.shape.m)
        masks = self.masks_for(np.asarray(list(tokens), dtype=object))
        return np.bitwise_or.reduce(masks, axis=0)

    def bit_positions_for(self, tokens) -> np.ndarray:
        """Sorted distinct bit positions set by these tokens (query-side)."""
        filt = self.filter_for(tokens)
        return np.flatnonzero(B.unpack(filt, self.shape.m)).astype(np.int64)


def record_filters(token_masks: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(T, W) per-token masks + record start offsets -> (R, W) record
    filters via one segmented OR (no per-record Python)."""
    return B.or_reduceat(token_masks, offsets)
