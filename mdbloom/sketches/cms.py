"""Count-min sketch (Cormode & Muthukrishnan 2005).

Geometry from the published bounds: width w = ceil(e / eps), depth
d = ceil(ln(1 / delta)). Point estimate = min over rows; always an
overestimate; error <= eps * N with probability >= 1 - delta.
Merge = element-wise sum (associative, commutative).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from mdbloom.sketches.common import hash64, splitmix64

_MAGIC = b"MDM1"


class CountMinSketch:
    def __init__(self, eps: float = 1e-3, delta: float = 1e-3,
                 counts: np.ndarray | None = None,
                 width: int | None = None, depth: int | None = None):
        self.width = width or int(math.ceil(math.e / eps))
        self.depth = depth or int(math.ceil(math.log(1.0 / delta)))
        self.eps = math.e / self.width
        self.delta = math.exp(-self.depth)
        self.counts = (np.zeros((self.depth, self.width), dtype=np.int64)
                       if counts is None else counts)
        self.total = int(self.counts.sum() // max(self.depth, 1))

    def _positions(self, values) -> np.ndarray:
        """(d, n) column index per row, via independent SplitMix64-derived
        streams per row (enhanced-double-hash style row mixing)."""
        h1 = hash64(values, seed=0xC0FFEE)
        h2 = splitmix64(h1)
        w = np.uint64(self.width)
        rows = []
        old = np.seterr(over="ignore")
        try:
            for j in range(self.depth):
                j64 = np.uint64(j)
                tet = np.uint64((j ** 3 - j) // 6)
                rows.append(((h1 + j64 * h2 + tet) % w).astype(np.int64))
        finally:
            np.seterr(**old)
        return np.stack(rows)

    def update(self, values, weights=None) -> "CountMinSketch":
        n = len(values)
        if n == 0:
            return self
        pos = self._positions(values)
        if weights is None:
            w = np.ones(n, dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
        for j in range(self.depth):
            np.add.at(self.counts[j], pos[j], w)
        self.total += int(w.sum())
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("geometry mismatch")
        self.counts += other.counts
        self.total += other.total
        return self

    def query(self, values) -> np.ndarray:
        """Vectorized point estimates (always >= true count)."""
        if len(values) == 0:
            return np.zeros(0, dtype=np.int64)
        pos = self._positions(values)
        ests = np.stack([self.counts[j, pos[j]] for j in range(self.depth)])
        return ests.min(axis=0)

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sIIq", _MAGIC, self.depth, self.width, self.total)
        return head + self.counts.astype("<i8").tobytes()

    @staticmethod
    def from_bytes(raw: bytes) -> "CountMinSketch":
        magic, depth, width, total = struct.unpack_from("<4sIIq", raw)
        if magic != _MAGIC:
            raise ValueError("not a CountMinSketch payload")
        counts = np.frombuffer(raw[20:], dtype="<i8").reshape(depth, width).copy()
        cms = CountMinSketch(width=width, depth=depth, counts=counts)
        cms.total = total
        return cms
