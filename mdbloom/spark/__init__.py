"""Distributed (PySpark) engine.

Layout of a built Bloom index (format v5; all Parquet, Iceberg-shaped:
partition column ``shard`` + manifest tables we maintain ourselves —
SURVEY §7):

  ``storage/``  (shard, key, <ids>, <payload>, filter)  one row per value;
                 the multimap `I -> [E]` (`Container.java:171-221`); rows
                 carry their filter words so artifact-only compaction can
                 rebuild slabs without the source table
  ``slabs/``    (shard, chunk, slot_lo, n_slots, slab array<bigint>,
                 keys_blob)                             bit-sliced slab
                 chunks, uint64[m, ceil(n/64)] (FlatBloofi transposed
                 layout, `FlatBloofi.java:55-60`); keys embedded per chunk
                 (slot->key map derived at read time, no slotmap table)
  ``manifest/`` (shard, n_turns, n_slots, n_chunks, summary, token_gate,
                 n_tokens, fingerprint, build_ms)       per-shard lineage +
                 OR-summary + population-sized distinct-token gate
                 (counting-gate analogue, `ContainerImpl.java:58-61`)
  ``token_hashes/`` per-shard DISTINCT dimension-token stream — the exact
                 token-set source of truth for rebuilding gates
  ``manifest_tree/`` (level, grp, summary, token_gate, gate_m, gate_k)
                 hierarchical group summaries/gates to a root — the Bloofi
                 inner-node layer batched planning descends
  ``tombstones/`` (shard, key, <ids>) append-only removals until compact
"""

from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.transcripts import synthesize_transcripts

__all__ = ["BloomIndexWriter", "BloomIndexReader", "IndexConfig",
           "synthesize_transcripts"]
