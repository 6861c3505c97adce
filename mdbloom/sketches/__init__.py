"""Mergeable sketches (north-rule companions to the Bloom container).

Each sketch is a small NumPy-state object with the same contract:

  * ``update(values)``   — absorb a vectorized batch (no per-row Python);
  * ``merge(other)``     — associative, commutative combine;
  * ``to_bytes()`` / ``from_bytes()`` — canonical state serialization
    (what Spark carries in BinaryType columns between partial and final
    aggregation);
  * an estimator with a published error bound, asserted in tests against
    exact oracles.

The reference has exactly one mergeable sketch — the Bloom filter with OR
merge (`EWAHBloomFilter.java:80-84`) and its counting-gate variant
(`ContainerImpl.java:58-61`). HLL / count-min / KLL / t-digest are the
BASELINE.json ``north_rule`` additions.
"""

from mdbloom.sketches.bloom import BloomSketch, CountingBloomSketch
from mdbloom.sketches.hll import HllSketch
from mdbloom.sketches.cms import CountMinSketch
from mdbloom.sketches.kll import KllSketch
from mdbloom.sketches.tdigest import TDigest

SKETCHES = {
    "bloom": BloomSketch,
    "counting_bloom": CountingBloomSketch,
    "hll": HllSketch,
    "cms": CountMinSketch,
    "kll": KllSketch,
    "tdigest": TDigest,
}

__all__ = ["BloomSketch", "CountingBloomSketch", "HllSketch",
           "CountMinSketch", "KllSketch", "TDigest", "SKETCHES"]
