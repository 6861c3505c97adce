"""t-digest quantile sketch — the *merging* variant (Dunning & Ertl,
"Computing Extremely Accurate Quantiles Using t-Digests", 2019).

Centroids (mean, weight) kept sorted by mean; an incoming batch (or another
digest) is merge-sorted with the current centroids and recompressed in one
ordered pass under the k1 scale function

    k(q) = (delta / 2pi) * asin(2q - 1)

which bounds each centroid to k-size 1 and concentrates resolution at the
tails (relative rank error ~ O(1/delta) at the extremes). Fully
deterministic — no RNG — so merges are reproducible by construction.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"MDT1"


class TDigest:
    def __init__(self, delta: float = 100.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64) if means is None else means
        self.weights = (np.empty(0, dtype=np.float64)
                        if weights is None else weights)
        self._min = float(self.means[0]) if self.means.size else np.inf
        self._max = float(self.means[-1]) if self.means.size else -np.inf

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _recompress(self, means: np.ndarray, weights: np.ndarray):
        """Fully vectorized ordered compression: each element lands in the
        k-bucket of its midpoint rank (buckets cut at half-integer k-values,
        so every merged centroid has k-size <= ~1); one bincount merges each
        bucket. O(n log n), no per-element Python loop — a greedy scan would
        be the hot-path bottleneck inside executor UDFs."""
        if means.size == 0:
            self.means = means
            self.weights = weights
            return
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        total = w.sum()
        q_mid = (np.cumsum(w) - w / 2.0) / total
        bucket = np.floor(2.0 * self._k(q_mid)).astype(np.int64)
        change = np.empty(m.size, dtype=bool)
        change[0] = True
        change[1:] = bucket[1:] != bucket[:-1]
        gid = np.cumsum(change) - 1
        gw = np.bincount(gid, weights=w)
        gm = np.bincount(gid, weights=w * m) / gw
        self.means = gm
        self.weights = gw

    def update(self, values, weights=None) -> "TDigest":
        vals = np.asarray(values, dtype=np.float64)
        if weights is None:
            w = np.ones(vals.size, dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)
        keep = ~np.isnan(vals)
        vals, w = vals[keep], w[keep]
        if vals.size == 0:
            return self
        self._min = min(self._min, float(vals.min()))
        self._max = max(self._max, float(vals.max()))
        # pre-aggregate duplicate values so the compress pass is short
        uniq, inv = np.unique(vals, return_inverse=True)
        agg_w = np.bincount(inv, weights=w)
        self._recompress(np.concatenate([self.means, uniq]),
                         np.concatenate([self.weights, agg_w]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("delta mismatch")
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._recompress(np.concatenate([self.means, other.means]),
                         np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        total = self.weights.sum()
        # centroid "positions": cumulative weight at centroid center
        cum = np.cumsum(self.weights) - self.weights / 2.0
        targets = np.clip(qs, 0, 1) * total
        out = np.interp(targets, cum, self.means,
                        left=self._min, right=self._max)
        return float(out[0]) if scalar else out

    def cdf(self, x) -> np.ndarray | float:
        scalar = np.isscalar(x)
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(xs.shape, np.nan)
            return float(out[0]) if scalar else out
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        out = np.interp(xs, self.means, cum / total, left=0.0, right=1.0)
        return float(out[0]) if scalar else out

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sdddI", _MAGIC, self.delta, self._min,
                           self._max, self.means.size)
        return (head + self.means.astype("<f8").tobytes()
                + self.weights.astype("<f8").tobytes())

    @staticmethod
    def from_bytes(raw: bytes) -> "TDigest":
        magic, delta, mn, mx, size = struct.unpack_from("<4sdddI", raw)
        if magic != _MAGIC:
            raise ValueError("not a TDigest payload")
        off = struct.calcsize("<4sdddI")
        means = np.frombuffer(raw, dtype="<f8", count=size, offset=off).copy()
        weights = np.frombuffer(raw, dtype="<f8", count=size,
                                offset=off + size * 8).copy()
        td = TDigest(delta, means, weights)
        td._min, td._max = mn, mx
        return td
