"""``spark.read.format("mdbloom")`` — the index as a native Spark data
source (PySpark 4 Python Data Source API).

Gives the engine the idiomatic *read surface* a Spark user expects on
top of the existing reader machinery: the storage multimap of a built
index is a DataFrame via ``spark.read``, with

* **containment pushdown** — ``option("tokens", "role=user,tok=w1")``
  runs the reference containment semantics (`ContainerImpl.java:155-182`)
  INSIDE the source: shard pruning happens at partition-planning time
  (summary + population token gate, same sparse word tests as
  `BloomIndexReader.prune_shards`), and the per-row superset test runs
  vectorized over each shard's Arrow batches before rows ever reach
  Spark;
* **filter pushdown** — ``.where(col("shard") == 3)`` and
  ``.where(col("key") == '<hex>')`` are pushed into the source
  (`pushFilters`): shard equality prunes whole partitions, key equality
  becomes a parquet-level filter (row-group stats + the key bloom
  filter written at build time prune the scan);
* **live-row semantics** — append-only tombstones are anti-joined per
  shard, exactly like `BloomIndexReader.storage`.

Planning is entirely Spark-free (the local XXH64 / md5 mirrors), so the
source also works from `spark-submit --py-files` executors. Each input
partition is one shard directory; `read` yields Arrow RecordBatches —
no per-row Python anywhere.

Usage::

    from mdbloom.spark.datasource import MdbloomDataSource
    spark.dataSource.register(MdbloomDataSource)
    df = (spark.read.format("mdbloom")
          .option("path", index_dir)
          .option("tokens", "role=assistant,tok=w00001")
          .load())

Options: ``path`` (required); ``tokens`` — comma-separated dimension
tokens, containment semantics (tokens containing commas need the
DataFrame API paths instead); ``include_filter`` — "true" keeps the
stored ``filter`` word column (default drops it, like
``storage(keep_filter=False)``).
"""

from __future__ import annotations

import json
import os

import numpy as np

from pyspark.sql.datasource import (DataSource, DataSourceReader, EqualTo,
                                    In, InputPartition)

from mdbloom import bits as B


def _load_cfg(path: str):
    from mdbloom.spark.build import IndexConfig
    with open(os.path.join(path, "config.json")) as f:
        raw = f.read()
    ver = json.loads(raw).get("format_version")
    if ver != IndexConfig.FORMAT_VERSION:
        raise ValueError(
            f"index at {path} has on-disk format v{ver}; this source "
            f"requires v{IndexConfig.FORMAT_VERSION} — rebuild the index")
    return IndexConfig.from_json(raw)


def _planner(cfg):
    """(tokens -> container qbits, tokens -> packed gate filter), built on
    the Spark-free hash mirrors the backend recorded at build time."""
    if cfg.hash_backend == "jvm":
        from mdbloom.spark.jvm_hash import JvmTokenHasher
        h = JvmTokenHasher(None)  # positions() never touches Spark
        return (lambda t: h.positions(t, cfg.shape),
                lambda t: h.packed_filter(t, cfg.gate_shape))
    from mdbloom.hashing import TokenMaskCache
    c, g = TokenMaskCache(cfg.shape), TokenMaskCache(cfg.gate_shape)
    return (lambda t: c.bit_positions_for(list(t)),
            lambda t: g.filter_for(list(t)))


def _storage_dataset(path: str):
    import pyarrow.dataset as pads
    return pads.dataset(os.path.join(path, "storage"), format="parquet",
                        partitioning="hive")


class MdbloomReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options["path"]
        self.cfg = _load_cfg(self.path)
        self.schema = schema
        toks = options.get("tokens")
        self.tokens = [t for t in toks.split(",") if t] if toks else []
        self._shard_pred: set[int] | None = None  # None = unrestricted
        self._key_pred: set[str] | None = None

    # -------- pushdown --------
    def pushFilters(self, filters):
        for f in filters:
            col = ".".join(f.attribute)
            if isinstance(f, EqualTo) and col == "shard":
                s = {int(f.value)}
                self._shard_pred = s if self._shard_pred is None \
                    else self._shard_pred & s
            elif isinstance(f, In) and col == "shard":
                s = {int(v) for v in f.value}
                self._shard_pred = s if self._shard_pred is None \
                    else self._shard_pred & s
            elif isinstance(f, EqualTo) and col == "key":
                k = {str(f.value)}
                self._key_pred = k if self._key_pred is None \
                    else self._key_pred & k
            else:
                yield f  # unsupported -> Spark applies it

    # -------- planning (driver, Spark-free) --------
    def partitions(self):
        import pyarrow.dataset as pads
        man = pads.dataset(os.path.join(self.path, "manifest"),
                           format="parquet") \
            .to_table(columns=["shard", "summary", "token_gate"])
        shards = man["shard"].to_numpy()
        keep = np.ones(len(shards), dtype=bool)
        if self.tokens:
            qbits, gate = _planner(self.cfg)
            summaries = np.stack([np.frombuffer(b, dtype=B.U64)
                                  for b in man["summary"].to_pylist()])
            keep &= B.contains_words(
                summaries, *B.nonzero_words(
                    B.from_bits(qbits(self.tokens), self.cfg.shape.m)))
            gl = man["token_gate"].to_pylist()
            if all(b is not None for b in gl):
                gates = np.stack([np.frombuffer(b, dtype=B.U64)
                                  for b in gl])
                keep &= B.contains_words(
                    gates, *B.nonzero_words(gate(self.tokens)))
        if self._shard_pred is not None:
            keep &= np.isin(shards, list(self._shard_pred))
        return [InputPartition(int(s)) for s in shards[keep]]

    # -------- execution (executor, vectorized) --------
    def read(self, partition):
        import pyarrow as pa
        import pyarrow.dataset as pads
        from pyspark.sql.pandas.types import to_arrow_schema

        if partition is None:  # partitions() pruned every shard
            return
        shard = partition.value
        expr = pads.field("shard") == shard
        if self._key_pred is not None:
            expr = expr & pads.field("key").isin(sorted(self._key_pred))
        cols = [f.name for f in self.schema.fields]
        scan_cols = list(dict.fromkeys(
            cols + (["filter"] if self.tokens else [])))
        tbl = _storage_dataset(self.path).to_table(columns=scan_cols,
                                                   filter=expr)
        if self.tokens and len(tbl):
            qbits, _ = _planner(self.cfg)
            q = B.from_bits(qbits(self.tokens),
                            self.cfg.shape.m).view(np.int64)
            words = np.stack(tbl["filter"].to_numpy(zero_copy_only=False))
            idx = np.flatnonzero(q)
            ok = np.all((words[:, idx] & q[idx]) == q[idx], axis=1) \
                if idx.size else np.ones(len(tbl), dtype=bool)
            tbl = tbl.filter(pa.array(ok))
        tomb = os.path.join(self.path, "tombstones")
        if os.path.exists(tomb) and len(tbl):
            ids = list(self.cfg.id_columns)
            dead = pads.dataset(tomb, format="parquet").to_table(
                columns=["shard", "key"] + ids,
                filter=pads.field("shard") == shard)
            if len(dead):
                import pandas as pd
                left = tbl.select(["key"] + ids).to_pandas()
                right = dead.select(["key"] + ids).to_pandas() \
                    .drop_duplicates()
                hit = left.merge(right, on=["key"] + ids, how="left",
                                 indicator=True)["_merge"] \
                    .to_numpy() == "left_only"
                tbl = tbl.filter(pa.array(hit))
        out = tbl.select(cols).cast(to_arrow_schema(self.schema))
        yield from out.to_batches()


class MdbloomDataSource(DataSource):
    """See module docstring. Register with
    ``spark.dataSource.register(MdbloomDataSource)``."""

    @classmethod
    def name(cls):
        return "mdbloom"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema
        path = self.options["path"]
        _load_cfg(path)  # fail fast on format drift
        sch = _storage_dataset(path).schema
        names = [n for n in sch.names
                 if n != "filter"
                 or self.options.get("include_filter", "").lower() == "true"]
        import pyarrow as pa
        return from_arrow_schema(pa.schema([sch.field(n) for n in names]))

    def reader(self, schema):
        return MdbloomReader(self.options, schema)
