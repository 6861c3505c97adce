"""Distributed (PySpark) engine.

Layout of a built Bloom index (all Parquet, Iceberg-shaped: partition
column ``shard`` + a manifest table we maintain ourselves — SURVEY §7):

  ``storage/``  (shard, key, conv_id, turn_idx)       one row per value;
                 the multimap `I -> [E]` (`Container.java:171-221`)
  ``slotmap/``  (shard, slot, key)                     one row per DISTINCT
                 filter; slot = rank of key within shard (content-addressed
                 dedup, `ContainerImplTest.java:138-162`)
  ``slabs/``    (shard, chunk, slot_lo, n_slots, slab) bit-sliced slab
                 chunks, uint64[m, ceil(n/64)] little-endian bytes
                 (FlatBloofi transposed layout, `FlatBloofi.java:55-60`)
  ``manifest/`` (shard, n_turns, n_slots, n_chunks, summary, gate,
                 fingerprint, build_ms)                per-shard lineage +
                 OR-summary (pruning tree leaves) + per-bit distinct-filter
                 counts (counting-gate analogue, `ContainerImpl.java:58-61`)
"""

from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.transcripts import synthesize_transcripts

__all__ = ["BloomIndexWriter", "BloomIndexReader", "IndexConfig",
           "synthesize_transcripts"]
