"""Packed-bitset primitives on little-endian ``uint64`` arrays.

The canonical at-rest / in-flight filter format for the whole engine:
bit ``b`` lives in word ``b >> 6`` at position ``b & 63``; words are
little-endian uint64, serialized with ``tobytes()``. Freezing this byte
order makes content-addressed keys canonical across builds (SURVEY §7
"hard parts (a)").

Functional parity targets in the reference (re-expressed, not ported):
  * build-from-bits   — `EWAHBloomFilter.java:52-56,87-90`
  * merge (OR)        — `EWAHBloomFilter.java:80-84,120-123`
  * contains(filter)  — superset test `EWAHBloomFilter.java:125-132`
  * cardinality et al — `EWAHBloomFilter.java:104-107,125-150`

All operations are vectorized across N filters at once (axis 0 = filter,
axis 1 = word) — no per-row Python in any hot path.
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.dtype("<u8")

# SWAR popcount constants (numpy 1.26 has no bitwise_count; added in 2.0)
_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def n_words(m: int) -> int:
    return (m + 63) >> 6


def zeros(m: int, n: int | None = None) -> np.ndarray:
    """Empty packed filter(s): shape (words,) or (n, words)."""
    w = n_words(m)
    return np.zeros(w if n is None else (n, w), dtype=U64)


def set_bits(packed: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Set bit positions (1-D int array) in a single packed filter, in place."""
    bits = np.asarray(bits, dtype=np.int64)
    if bits.size:
        words = bits >> 6
        masks = np.uint64(1) << (bits & 63).astype(np.uint64)
        np.bitwise_or.at(packed, words, masks)
    return packed


def from_bits(bits: np.ndarray, m: int) -> np.ndarray:
    """Packed filter from bit positions."""
    return set_bits(zeros(m), bits)


def masks_from_positions(pos: np.ndarray, m: int) -> np.ndarray:
    """Vectorized build of N packed filters from an (N, k) matrix of bit
    positions — one np.bitwise_or.at, no Python loop."""
    pos = np.asarray(pos, dtype=np.int64)
    n = pos.shape[0]
    out = zeros(m, n)
    if n and pos.size:
        rows = np.repeat(np.arange(n), pos.shape[1])
        flat = pos.ravel()
        np.bitwise_or.at(out, (rows, flat >> 6),
                         np.uint64(1) << (flat & 63).astype(np.uint64))
    return out


def or_reduceat(masks: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Segmented OR: rows of ``masks`` grouped by ``offsets`` (start index of
    each segment, strictly increasing). The vectorized analogue of merging
    one filter per record from its per-token filters (reference merges one
    hasher per property, `ContainerImplTest.java:77-85`)."""
    return np.bitwise_or.reduceat(masks, offsets, axis=0)


def merge_or(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Filter union — THE associative/commutative/idempotent merge
    (`EWAHBloomFilter.java:80-84`)."""
    return np.bitwise_or(a, b)


def contains(stored: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Superset test: does each stored filter contain every query bit?
    ``stored`` is (N, W) or (W,), ``query`` is (W,). Reference semantics:
    `andCardinality(q) == q.cardinality()` (`EWAHBloomFilter.java:125-132`)."""
    if stored.ndim == 1:
        return bool(np.all((stored & query) == query))
    return np.all((stored & query) == query, axis=1)


def nonzero_words(query: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(word indices, word values) of a packed filter's nonzero words —
    the sparse form of a query. A Bloom query sets only ~k·tokens bits,
    so at large m almost every word is zero; containment tests need only
    the nonzero ones."""
    idx = np.flatnonzero(query)
    return idx, query[idx]


def contains_words(stored: np.ndarray, idx: np.ndarray,
                   vals: np.ndarray) -> np.ndarray:
    """Sparse superset test: :func:`contains` restricted to the query's
    nonzero words (``idx``, ``vals`` from :func:`nonzero_words`).
    Identical result, but touches ``N × |idx|`` words instead of the full
    ``N × W`` matrix — at a population-sized gate (m ≈ 2²⁰, W = 16384) a
    few-token query reads ~2000× less memory, which keeps batched query
    planning off the DRAM-bandwidth hot path. Empty query ⇒ all True."""
    if stored.ndim == 1:
        return bool(np.all((stored[idx] & vals) == vals))
    if idx.size == 0:
        return np.ones(stored.shape[0], dtype=bool)
    return np.all((stored[:, idx] & vals) == vals, axis=1)


def equals(stored: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Bit-for-bit equality (exact-match `get`, `Container.java:60-65`)."""
    if stored.ndim == 1:
        return bool(np.all(stored == query))
    return np.all(stored == query, axis=1)


def popcount64(a: np.ndarray) -> np.ndarray:
    """SWAR popcount per uint64 element (vectorized)."""
    a = a.astype(np.uint64, copy=True)
    a -= (a >> np.uint64(1)) & _M1
    a = (a & _M2) + ((a >> np.uint64(2)) & _M2)
    a = (a + (a >> np.uint64(4))) & _M4
    return ((a * _H01) >> np.uint64(56)).astype(np.int64)


def cardinality(packed: np.ndarray) -> np.ndarray:
    """Popcount of each filter: (N, W) -> (N,), (W,) -> scalar."""
    pc = popcount64(packed)
    if packed.ndim == 1:
        return int(pc.sum())
    return pc.sum(axis=1)


def and_cardinality(a: np.ndarray, b: np.ndarray):
    return cardinality(np.bitwise_and(a, b))


def or_cardinality(a: np.ndarray, b: np.ndarray):
    return cardinality(np.bitwise_or(a, b))


def xor_cardinality(a: np.ndarray, b: np.ndarray):
    return cardinality(np.bitwise_xor(a, b))


def unpack(packed: np.ndarray, m: int) -> np.ndarray:
    """(N, W) packed -> (N, m) uint8 bit matrix (or (W,) -> (m,))."""
    one_d = packed.ndim == 1
    arr = np.atleast_2d(packed).astype(U64).view(np.uint8)
    bits = np.unpackbits(arr, axis=1, bitorder="little")[:, :m]
    return bits[0] if one_d else bits


def pack_bits_matrix(bits: np.ndarray) -> np.ndarray:
    """(N, m) 0/1 matrix -> (N, W) packed uint64."""
    one_d = bits.ndim == 1
    b = np.atleast_2d(bits).astype(np.uint8)
    n, m = b.shape
    w = n_words(m)
    bytes_ = np.packbits(b, axis=1, bitorder="little")
    padded = np.zeros((n, w * 8), dtype=np.uint8)
    padded[:, : bytes_.shape[1]] = bytes_
    out = padded.view(U64)
    return out[0] if one_d else out


def to_bytes(packed: np.ndarray) -> bytes:
    """Canonical serialization: little-endian uint64 words."""
    return packed.astype(U64).tobytes()


def from_bytes(raw: bytes, m: int | None = None) -> np.ndarray:
    arr = np.frombuffer(raw, dtype=U64).copy()
    if m is not None and arr.size != n_words(m):
        raise ValueError(f"expected {n_words(m)} words for m={m}, got {arr.size}")
    return arr


def content_key(packed: np.ndarray) -> str:
    """Content-addressed index key: md5 hex of the canonical bytes.

    Plays the role of the reference's UUID-v3-from-filter-bytes key
    (`ContainerImplTest.java:138-162`, used by every `Index.create`):
    identical filters dedup to one index entry; exact-get becomes a
    key-equality lookup."""
    return hashlib.md5(to_bytes(packed)).hexdigest()


def content_keys(packed: np.ndarray) -> list:
    """Vector form of :func:`content_key` over (N, W)."""
    raw = packed.astype(U64).tobytes()
    w8 = packed.shape[1] * 8
    return [hashlib.md5(raw[i * w8:(i + 1) * w8]).hexdigest()
            for i in range(packed.shape[0])]
