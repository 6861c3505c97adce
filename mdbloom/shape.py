"""Bloom filter Shape math.

Reproduces the public commons-collections4 ``Shape`` contract the reference
depends on (reference `pom.xml:26-30`; usage `ContainerImpl.java:87-94`,
test shapes `IndexTest.java:47` -> (n=3, p=1e-4) => m=58, k=13 and
`ContainerImplTest.java:42` -> (n=3, p=1/3e6) => m=94, k=22). The formulas
are standard published Bloom filter math (Bloom 1970; Kirsch-Mitzenmacher
2006 for the double-hashing scheme):

    m = ceil( n * ln(p) / -(ln 2)^2 )
    k = round( (m / n) * ln 2 )
    p_actual = (1 - exp(-k * n / m)) ** k
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

_LN2 = math.log(2.0)
_DENOM = -(_LN2 * _LN2)  # ln(1 / 2^ln2) = -(ln 2)^2 ~ -0.480453


@dataclass(frozen=True)
class Shape:
    """Immutable Bloom filter shape: ``n`` expected items, ``m`` bits,
    ``k`` hash functions, plus the achieved false-positive probability.

    Mirrors the validation role of the reference's per-container Shape
    (`ContainerImpl.java:204-217`): two filters are only comparable when
    their shapes match.
    """

    n: int
    m: int
    k: int
    probability: float = field(default=0.0, compare=False)

    @staticmethod
    def from_np(n: int, p: float) -> "Shape":
        """Build a shape from (expected items, target FPR) — the main
        constructor used by every reference test."""
        if n <= 0:
            raise ValueError(f"n must be > 0, got {n}")
        if not (0.0 < p < 1.0):
            raise ValueError(f"p must be in (0, 1), got {p}")
        m = int(math.ceil(n * math.log(p) / _DENOM))
        k = int(round((m / n) * _LN2))
        if k < 1:
            k = 1
        return Shape(n=n, m=m, k=k, probability=Shape._actual_p(n, m, k))

    @staticmethod
    def from_mk(m: int, k: int, n: int | None = None) -> "Shape":
        """Build a shape directly from (m, k); n defaults to the optimal
        capacity for the given geometry."""
        if m <= 0 or k <= 0:
            raise ValueError(f"m and k must be > 0, got m={m} k={k}")
        if n is None:
            n = max(1, int(round((m / k) * _LN2)))
        return Shape(n=n, m=m, k=k, probability=Shape._actual_p(n, m, k))

    @staticmethod
    def _actual_p(n: int, m: int, k: int) -> float:
        return (1.0 - math.exp(-k * n / m)) ** k

    @property
    def words(self) -> int:
        """Number of little-endian uint64 words in the packed filter."""
        return (self.m + 63) >> 6

    @property
    def nbytes(self) -> int:
        return self.words * 8

    def predicted_fpr(self, n_inserted: int) -> float:
        """FPR predicted for a filter holding ``n_inserted`` distinct items."""
        return (1.0 - math.exp(-self.k * n_inserted / self.m)) ** self.k

    def estimate_n(self, cardinality: int) -> float:
        """Swamidass-Baldi estimate of the number of inserted items from the
        observed popcount ``cardinality``: n_hat = -(m/k) * ln(1 - c/m)."""
        if cardinality >= self.m:
            return float("inf")
        return -(self.m / self.k) * math.log(1.0 - cardinality / self.m)

    def gate_shape(self, estimated_population: int | None = None) -> "Shape":
        """Shape for the container-level counting gate. The reference sizes
        it from the estimated population, defaulting to ``1/p``
        (`ContainerImpl.java:70-72,92-93`)."""
        pop = estimated_population
        if pop is None:
            pop = int(round(1.0 / max(self.probability, 1e-12)))
        # floor applies to BOTH branches: a measured population of 0
        # (empty dataset) must fall back to a valid 1-element gate, not
        # propagate n=0 into Shape.from_np's ValueError
        pop = max(1, pop)
        return Shape.from_np(pop, self.probability if 0 < self.probability < 1 else 1e-4)

    def to_dict(self) -> dict:
        return {"n": self.n, "m": self.m, "k": self.k, "probability": self.probability}

    @staticmethod
    def from_dict(d: dict) -> "Shape":
        return Shape(n=int(d["n"]), m=int(d["m"]), k=int(d["k"]),
                     probability=float(d.get("probability", 0.0)))
