"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
standard small-range linear-counting correction).

State: 2^p uint8 registers; merge = element-wise max (associative,
commutative, idempotent). Relative standard error ~ 1.04 / sqrt(2^p).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from mdbloom.sketches.common import clz_tail, hash64

_MAGIC = b"MDH1"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HllSketch:
    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not (4 <= p <= 18):
            raise ValueError(f"p must be in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.registers = (np.zeros(self.m, dtype=np.uint8)
                          if registers is None else registers)

    def update(self, values) -> "HllSketch":
        if len(values) == 0:
            return self
        h = hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        tail = h & ((np.uint64(1) << np.uint64(64 - self.p)) - np.uint64(1))
        rho = (clz_tail(tail, 64 - self.p) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HllSketch") -> "HllSketch":
        if other.p != self.p:
            raise ValueError("precision mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        e = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:
            v = int(np.count_nonzero(self.registers == 0))
            if v > 0:
                return m * math.log(m / v)  # linear counting
        return float(e)

    @property
    def rse(self) -> float:
        """Published relative standard error."""
        return 1.04 / math.sqrt(self.m)

    def to_bytes(self) -> bytes:
        return struct.pack("<4sI", _MAGIC, self.p) + self.registers.tobytes()

    @staticmethod
    def from_bytes(raw: bytes) -> "HllSketch":
        magic, p = struct.unpack_from("<4sI", raw)
        if magic != _MAGIC:
            raise ValueError("not an HllSketch payload")
        regs = np.frombuffer(raw[8:], dtype=np.uint8).copy()
        if regs.size != (1 << p):
            # a truncated payload would otherwise yield a sketch that
            # silently returns wrong estimates and crashes on update
            raise ValueError(
                f"HllSketch payload: expected {1 << p} registers "
                f"(p={p}), got {regs.size}")
        return HllSketch(p, regs)
