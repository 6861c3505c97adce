"""mdbloom — a from-scratch PySpark-native multidimensional Bloom filter and
mergeable-sketch library.

Capability parity target: Claudenw/MultidimentionalBloom (reference snapshot
at /root/reference, Apache-2.0). This is NOT a port — the reference is a
single-threaded Java in-memory container (`ContainerImpl.java`); this package
re-expresses its query semantics (exact get / containment search over a
population of Bloom filters, §Container.java:60-93) as:

  * a pure NumPy kernel (``mdbloom.kernel``) — bit-sliced slab arithmetic,
    the distributed analogue of the reference's FlatBloofi
    (`FlatBloofi.java:48-227`);
  * a local container (``mdbloom.container``) with pluggable index
    strategies mirroring the reference's Index SPI (`Container.java:111-169`);
  * mergeable sketches (``mdbloom.sketches``) — Bloom, HLL, count-min,
    KLL, t-digest — with associative, order-independent merges;
  * a Spark engine (``mdbloom.spark``) building per-partition slabs with
    Arrow-vectorized pandas UDFs and querying them with partition pruning.
"""

from mdbloom.shape import Shape
from mdbloom.hashing import token_hash_pair, km_bit_positions

__all__ = ["Shape", "token_hash_pair", "km_bit_positions", "EwahBitmap"]


def __getattr__(name):  # lazy: keep base import numpy-only
    if name == "EwahBitmap":
        from mdbloom.ewah import EwahBitmap
        return EwahBitmap
    raise AttributeError(name)
__version__ = "0.1.0"
