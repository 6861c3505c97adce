"""Bloom filter and counting Bloom filter as mergeable sketches.

Thin stateful wrappers over ``mdbloom.kernel`` so the Bloom filter joins
the UDAF family: OR merge is the reference's one true aggregation
(`EWAHBloomFilter.java:80-84`); the counting variant re-expresses the
container gate (`ContainerImpl.java:58-61`) with sum merge and subtraction
deletes.
"""

from __future__ import annotations

import struct

import numpy as np

from mdbloom import bits as B
from mdbloom.hashing import km_positions_matrix
from mdbloom.shape import Shape
from mdbloom.sketches.common import hash64

_MAGIC_BLOOM = b"MDB1"
_MAGIC_CBF = b"MDC1"


def _positions_for_batch(values, shape: Shape) -> np.ndarray:
    """(T,) values -> (U, k) positions for the UNIQUE values plus the
    inverse map; vectorized enhanced double hashing (mdbloom.hashing)."""
    arr = np.asarray(values, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    h1 = hash64(uniq, seed=0x51AB)
    h2 = hash64(uniq, seed=0xB10F)
    pos = km_positions_matrix(h1, h2, shape)
    return pos, inv


class BloomSketch:
    """Plain Bloom filter sketch: add values, OR-merge, membership test."""

    def __init__(self, shape: Shape, packed: np.ndarray | None = None):
        self.shape = shape
        self.packed = B.zeros(shape.m) if packed is None else packed

    def update(self, values) -> "BloomSketch":
        if len(values) == 0:
            return self
        pos, _ = _positions_for_batch(values, self.shape)
        B.set_bits(self.packed, np.unique(pos.ravel()))
        return self

    def merge(self, other: "BloomSketch") -> "BloomSketch":
        if other.shape != self.shape:
            raise ValueError("shape mismatch")
        self.packed = B.merge_or(self.packed, other.packed)
        return self

    def contains(self, values) -> np.ndarray:
        """Vectorized membership: True may be a false positive at the
        Shape's designed rate; False is definite."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos, inv = _positions_for_batch(values, self.shape)
        bits = B.unpack(self.packed, self.shape.m)
        uniq_hit = bits[pos].all(axis=1)
        return uniq_hit[inv]

    @property
    def cardinality(self) -> int:
        return int(B.cardinality(self.packed))

    def estimate_n(self) -> float:
        return self.shape.estimate_n(self.cardinality)

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sIII", _MAGIC_BLOOM, self.shape.n,
                           self.shape.m, self.shape.k)
        return head + B.to_bytes(self.packed)

    @staticmethod
    def from_bytes(raw: bytes) -> "BloomSketch":
        magic, n, m, k = struct.unpack_from("<4sIII", raw)
        if magic != _MAGIC_BLOOM:
            raise ValueError("not a BloomSketch payload")
        shape = Shape.from_mk(m, k, n=n)
        return BloomSketch(shape, B.from_bytes(raw[16:], m))


class CountingBloomSketch:
    """Counting Bloom filter: per-bit int32 counts; sum merge; subtraction
    delete; gate-style containment (`ContainerImpl.java:93,115,127,146`)."""

    def __init__(self, shape: Shape, counts: np.ndarray | None = None):
        self.shape = shape
        self.counts = (np.zeros(shape.m, dtype=np.int64)
                       if counts is None else counts)

    def update(self, values, sign: int = 1) -> "CountingBloomSketch":
        if len(values) == 0:
            return self
        pos, inv = _positions_for_batch(values, self.shape)
        # each value contributes once per its DISTINCT bit positions:
        # sort rows, zero-weight within-row duplicate positions, one add.at
        counts_per_uniq = np.bincount(inv, minlength=pos.shape[0])
        srt = np.sort(pos, axis=1)
        first = np.ones_like(srt, dtype=bool)
        first[:, 1:] = srt[:, 1:] != srt[:, :-1]
        w = np.broadcast_to(counts_per_uniq[:, None], srt.shape) * first
        np.add.at(self.counts, srt.ravel(), sign * w.ravel())
        return self

    def remove(self, values) -> "CountingBloomSketch":
        return self.update(values, sign=-1)

    def merge(self, other: "CountingBloomSketch") -> "CountingBloomSketch":
        if other.shape != self.shape:
            raise ValueError("shape mismatch")
        self.counts += other.counts
        return self

    def contains(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos, inv = _positions_for_batch(values, self.shape)
        uniq_hit = (self.counts[pos] > 0).all(axis=1)
        return uniq_hit[inv]

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sIII", _MAGIC_CBF, self.shape.n,
                           self.shape.m, self.shape.k)
        return head + self.counts.astype("<i8").tobytes()

    @staticmethod
    def from_bytes(raw: bytes) -> "CountingBloomSketch":
        magic, n, m, k = struct.unpack_from("<4sIII", raw)
        if magic != _MAGIC_CBF:
            raise ValueError("not a CountingBloomSketch payload")
        shape = Shape.from_mk(m, k, n=n)
        counts = np.frombuffer(raw[16:], dtype="<i8").copy()
        if counts.size != m:
            raise ValueError(
                f"CountingBloomSketch payload: expected {m} counters, "
                f"got {counts.size}")
        return CountingBloomSketch(shape, counts)
