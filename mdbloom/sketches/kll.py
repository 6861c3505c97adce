"""KLL quantile sketch (Karnin, Lang, Liberty 2016).

Compactor hierarchy: level h holds items of weight 2^h; a full level is
sorted and every other element (random offset) is promoted to level h+1.
Rank error is O(1/k) with high probability; we assert the empirical bound
from FIXTURES §4 (rank error <= 3 * (0.7/k) * n).

Determinism: the compaction coin uses a Generator seeded at construction —
partition-seeded in the Spark path — so checkpoint resume and merge-order
permutations reproduce identical estimates (SURVEY §7 hard part (c)).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"MDK1"
_C = 2.0 / 3.0


class KllSketch:
    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        self.compactors: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    # ---- geometry
    def _capacity(self, level: int) -> int:
        """Capacity of a level, growing toward the top (levels near the top
        hold ~k items; lower levels shrink by factor c)."""
        height = len(self.compactors)
        depth = height - 1 - level
        return max(2, int(np.ceil(self.k * (_C ** depth))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.compactors)))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    # ---- core
    def update(self, values) -> "KllSketch":
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return self
        self.compactors[0] = np.concatenate([self.compactors[0], vals])
        self.n += int(vals.size)
        self._compress()
        return self

    def _compress(self):
        while self._size() > self._total_capacity():
            for h in range(len(self.compactors)):
                if len(self.compactors[h]) > self._capacity(h):
                    self._compact_level(h)
                    break
            else:
                break

    def _compact_level(self, h: int):
        if h + 1 == len(self.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        buf = np.sort(self.compactors[h])
        offset = int(self._rng.integers(0, 2))
        pairs = len(buf) // 2
        promoted = buf[:2 * pairs][offset::2]  # one survivor per pair
        self.compactors[h] = buf[2 * pairs:]   # unpaired tail stays put
        self.compactors[h + 1] = np.concatenate(
            [self.compactors[h + 1], promoted])

    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.k != self.k:
            raise ValueError("k mismatch")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        for h, comp in enumerate(other.compactors):
            if comp.size:
                self.compactors[h] = np.concatenate(
                    [self.compactors[h], comp])
        self.n += other.n
        self._compress()
        return self

    # ---- estimators
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, comp in enumerate(self.compactors):
            if comp.size:
                vals.append(comp)
                wts.append(np.full(comp.size, 1 << h, dtype=np.int64))
        if not vals:
            return (np.empty(0), np.empty(0, dtype=np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q in [0, 1]."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted_items()
        if v.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        targets = np.clip(qs, 0, 1) * cum[-1]
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, v.size - 1)
        out = v[idx]
        return float(out[0]) if scalar else out

    def rank(self, value: float) -> float:
        """Estimated normalized rank of ``value``."""
        v, w = self._weighted_items()
        if v.size == 0:
            return float("nan")
        total = w.sum()
        return float(w[v <= value].sum() / total)

    # ---- serde
    def to_bytes(self) -> bytes:
        head = struct.pack("<4sIqqI", _MAGIC, self.k, self.n, self.seed,
                           len(self.compactors))
        parts = [head]
        for comp in self.compactors:
            parts.append(struct.pack("<I", comp.size))
            parts.append(comp.astype("<f8").tobytes())
        return b"".join(parts)

    @staticmethod
    def from_bytes(raw: bytes) -> "KllSketch":
        magic, k, n, seed, levels = struct.unpack_from("<4sIqqI", raw)
        if magic != _MAGIC:
            raise ValueError("not a KllSketch payload")
        sk = KllSketch(k, seed=seed)
        sk.n = n
        sk.compactors = []
        off = struct.calcsize("<4sIqqI")
        for _ in range(levels):
            (sz,) = struct.unpack_from("<I", raw, off)
            off += 4
            sk.compactors.append(
                np.frombuffer(raw, dtype="<f8", count=sz, offset=off).copy())
            off += sz * 8
        if not sk.compactors:
            sk.compactors = [np.empty(0, dtype=np.float64)]
        return sk
