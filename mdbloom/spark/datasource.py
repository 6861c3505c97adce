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

The format is also a SINK (:class:`MdbloomWriter`)::

    df.write.format("mdbloom").mode("append").option("path", p).save()

``overwrite`` (re)creates the index from the written rows (IndexConfig
fields accepted as options: n_per_record, probability, n_shards,
chunk_slots, tag_columns, id_columns, payload_columns, text_column,
hash_backend); ``append`` adds rows incrementally. The write is
LSM-shaped: executors stage Arrow batches as parquet, commit promotes
them atomically into ``<path>/pending/`` (Spark's Python Data Source
commit hook runs in a session-less plan worker, so it cannot launch
the index build), and the *fold* — ``build(resume=True)``, which
rebuilds only the shards the new rows hash into — runs distributed at
the next engine open (``BloomIndexReader`` auto-folds) or explicitly
via :func:`mdbloom.spark.build.fold_pending`. Until then this source
still reads the pending tail: it materializes (shard, key, filter) for
the staged rows with the same Spark-free hash mirrors the planner
uses, bit-identical to what the fold will build, so containment/key
pushdown and tombstone semantics hold on unfolded rows too.
"""

from __future__ import annotations

import json
import os

import numpy as np

from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                    DataSourceReader,
                                    DataSourceStreamArrowWriter, EqualTo,
                                    In, InputPartition,
                                    WriterCommitMessage)

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
    cfg = IndexConfig.from_json(raw)
    if cfg.storage_backend != "parquet":
        # this source's readers/sink stream the storage PARQUET files
        # directly (pyarrow dataset + pending tail) — a KV-backed value
        # store has no files to stream; fail with the remedy instead of
        # an obscure missing-directory error mid-scan
        raise ValueError(
            f"index at {path} uses storage_backend="
            f"{cfg.storage_backend!r}; the mdbloom data source supports "
            "only 'parquet' storage — query via BloomIndexReader instead")
    return cfg


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


def _pending_files(path: str) -> list:
    """Sink-staged parquet files not yet folded into the index."""
    pend = os.path.join(path, "pending")
    if not os.path.isdir(pend):
        return []
    return [os.path.join(pend, f) for f in sorted(os.listdir(pend))
            if f.endswith(".parquet")]


def _carry_columns(cfg) -> list:
    return list(cfg.id_columns) + [c for c in cfg.payload_columns
                                   if c not in cfg.id_columns]


def _encoder_for(series):
    """Per-column byte encoding matching Spark's XxHash64 expression:
    strings hash their UTF-8 bytes, byte/short/int via hashInt (4 LE
    bytes), long via hashLong (8 LE bytes)."""
    import struct
    kind = series.dtype.kind
    if kind == "O":
        if len(series) and not isinstance(series.iloc[0], str):
            raise ValueError(
                "mdbloom tail read supports string/int id columns only; "
                "fold the index first (BloomIndexReader folds on open)")
        return lambda v: v.encode("utf-8")
    if kind == "i":
        fmt = "<q" if series.dtype.itemsize == 8 else "<i"
        return lambda v: struct.pack(fmt, int(v))
    raise ValueError(
        "mdbloom tail read supports string/int id columns only; "
        "fold the index first (BloomIndexReader folds on open)")


def _shards_of(pdf, cfg) -> np.ndarray:
    """``pmod(xxhash64(<shard_cols>), n_shards)`` exactly as
    `build.shard_expr` assigns shards, without Spark: Spark's
    ``xxhash64(c1, c2, ...)`` CHAINS — the first column hashes with
    seed 42 and each later column hashes with the running hash as its
    seed — which the local XXH64 mirror reproduces column by column
    (parity-tested incl. the multi-column chain)."""
    from mdbloom.spark.jvm_hash import _signed, _xxh64
    cols = list(cfg.shard_cols)
    n_shards = int(cfg.n_shards)
    n = len(pdf)
    if n_shards == 1:
        return np.zeros(n, dtype=np.int32)
    encs = [_encoder_for(pdf[c]) for c in cols]
    sub = pdf[cols]
    # hash unique shard-key combinations only (a pending-tail batch has
    # far fewer conversations than rows), then scatter back with a
    # vectorized inverse index: ngroup(sort=False) numbers groups in
    # first-appearance order, exactly drop_duplicates' row order
    inv = sub.groupby(cols, sort=False, dropna=False).ngroup().to_numpy()
    uniq = sub.drop_duplicates()

    def chain(row) -> int:
        h = 42
        for enc, v in zip(encs, row):
            h = _xxh64(enc(v), h)
        return _signed(h) % n_shards

    shards_u = np.fromiter(
        (chain(row) for row in uniq.itertuples(index=False, name=None)),
        dtype=np.int32, count=len(uniq))
    return shards_u[inv]


def _tail_storage_table(path: str, cfg, files: list | None = None):
    """Materialize pending (unfolded) sink appends as storage-shaped
    rows ``(key, <carry>, filter, shard)`` — BIT-IDENTICAL to what the
    fold build will write, via the Spark-free mirrors: shard =
    pmod(chained xxhash64 over ``cfg.shard_cols``, n_shards) exactly as
    `build.shard_expr` (see `_shards_of` — incl. multi-column
    `shard_columns` chains), filter/key via the backend the config
    records. ``files`` restricts to a subset of
    pending files (one read task per file — tail parallelism equals
    the writer's task count; duplicate-id rows split across files
    would each surface until the fold merges them, which only matters
    if the IndexConfig id-uniqueness contract is violated). Returns a
    pyarrow Table or None."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    files = _pending_files(path) if files is None else files
    if not files:
        return None
    ds = pads.dataset(files, format="parquet")
    carry = _carry_columns(cfg)
    need = list(dict.fromkeys(
        carry + [c for c in cfg.tag_columns if c in ds.schema.names]
        + ([cfg.text_column] if cfg.text_column
           and cfg.text_column in ds.schema.names else [])))
    pdf = ds.to_table(columns=need).to_pandas()
    if not len(pdf):
        return None
    shard = _shards_of(pdf, cfg)

    if cfg.hash_backend == "jvm":
        from mdbloom.spark.build import record_tokens_pandas
        from mdbloom.spark.jvm_hash import (gate_positions_batch,
                                            spark_xxhash64_pair)
        # the jvm build aggregates filter words per (shard, carry) over
        # exploded token rows — records with zero tokens drop, duplicate
        # carry keys merge (build.filters_df / aggregated_filter_words)
        flat, rows = record_tokens_pandas(pdf, cfg)
        gid = pdf.groupby(carry, sort=False).ngroup().to_numpy()
        tu, tinv = np.unique(flat, return_inverse=True) if flat.size else \
            (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
        if not tu.size:
            return None
        pairs = np.array([spark_xxhash64_pair(t) for t in tu],
                         dtype=np.int64)
        masks = B.masks_from_positions(
            gate_positions_batch(pairs[:, 0], pairs[:, 1], cfg.shape),
            cfg.shape.m)
        n_groups = int(gid.max()) + 1
        packed = B.zeros(cfg.shape.m, n_groups)
        np.bitwise_or.at(packed, gid[rows], masks[tinv])
        live, first_idx = np.unique(gid, return_index=True)
        has_tok = np.isin(live, np.unique(gid[rows]))
        live, first_idx = live[has_tok], first_idx[has_tok]
        packed = packed[live]
        out_rows = pdf.iloc[first_idx]
        shard = shard[first_idx]
    else:
        from mdbloom.spark.build import filters_for_batch
        packed = filters_for_batch(pdf, cfg)  # one row per input row
        out_rows = pdf

    data = {"key": pa.array(B.content_keys(packed), pa.string())}
    for c in carry:
        data[c] = pa.Array.from_pandas(out_rows[c])
    signed = packed.view(np.int64)
    data["filter"] = pa.array(list(signed), pa.list_(pa.int64()))
    data["shard"] = pa.array(shard, pa.int32())
    return pa.table(data)


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
        parts = []
        man_dir = os.path.join(self.path, "manifest")
        if os.path.isdir(man_dir):  # absent on a sink-only unfolded index
            man = pads.dataset(man_dir, format="parquet") \
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
            parts = [InputPartition(int(s)) for s in shards[keep]]
        # pending rows span shards and are not in the manifest: one tail
        # partition PER pending file (string-valued, vs int shard ids) —
        # tail read parallelism equals the writer's task count
        parts.extend(InputPartition(f) for f in _pending_files(self.path))
        return parts

    # -------- execution (executor, vectorized) --------
    def _containment_filter(self, tbl):
        """Keep rows whose stored filter words are a superset of the
        query bits (`Linear.java:134-140` semantics, vectorized)."""
        import pyarrow as pa
        if not self.tokens or not len(tbl):
            return tbl
        qbits, _ = _planner(self.cfg)
        q = B.from_bits(qbits(self.tokens),
                        self.cfg.shape.m).view(np.int64)
        words = np.stack(tbl["filter"].to_numpy(zero_copy_only=False))
        idx = np.flatnonzero(q)
        ok = np.all((words[:, idx] & q[idx]) == q[idx], axis=1) \
            if idx.size else np.ones(len(tbl), dtype=bool)
        return tbl.filter(pa.array(ok))

    def _drop_tombstoned(self, tbl, shard: int | None):
        """Anti-join the append-only tombstones on (key, <ids>); shard
        restricts the tombstone scan when the rows are single-shard."""
        import pyarrow as pa
        import pyarrow.dataset as pads
        tomb = os.path.join(self.path, "tombstones")
        if not os.path.exists(tomb) or not len(tbl):
            return tbl
        ids = list(self.cfg.id_columns)
        dead = pads.dataset(tomb, format="parquet").to_table(
            columns=["shard", "key"] + ids,
            filter=None if shard is None
            else pads.field("shard") == shard)
        if not len(dead):
            return tbl
        left = tbl.select(["key"] + ids).to_pandas()
        right = dead.select(["key"] + ids).to_pandas().drop_duplicates()
        hit = left.merge(right, on=["key"] + ids, how="left",
                         indicator=True)["_merge"].to_numpy() == "left_only"
        return tbl.filter(pa.array(hit))

    def read(self, partition):
        import pyarrow.dataset as pads
        from pyspark.sql.pandas.types import to_arrow_schema

        if partition is None:  # partitions() pruned every shard
            return
        cols = [f.name for f in self.schema.fields]
        if isinstance(partition.value, str):  # one pending tail file
            import pyarrow as pa
            tbl = _tail_storage_table(self.path, self.cfg,
                                      files=[partition.value])
            if tbl is None:
                return
            if self._shard_pred is not None and len(tbl):
                tbl = tbl.filter(pa.array(np.isin(
                    tbl["shard"].to_numpy(), list(self._shard_pred))))
            if self._key_pred is not None and len(tbl):
                tbl = tbl.filter(pa.array(np.isin(
                    np.asarray(tbl["key"].to_pylist(), dtype=object),
                    sorted(self._key_pred))))
            tbl = self._drop_tombstoned(self._containment_filter(tbl),
                                        shard=None)
            out = tbl.select(cols).cast(to_arrow_schema(self.schema))
            yield from out.to_batches()
            return
        shard = partition.value
        expr = pads.field("shard") == shard
        if self._key_pred is not None:
            expr = expr & pads.field("key").isin(sorted(self._key_pred))
        scan_cols = list(dict.fromkeys(
            cols + (["filter"] if self.tokens else [])))
        tbl = _storage_dataset(self.path).to_table(columns=scan_cols,
                                                   filter=expr)
        tbl = self._drop_tombstoned(self._containment_filter(tbl),
                                    shard=shard)
        out = tbl.select(cols).cast(to_arrow_schema(self.schema))
        yield from out.to_batches()


def _options_cfg(options):
    """IndexConfig from write options (first write to a fresh dir)."""
    from mdbloom.spark.build import IndexConfig
    o = options
    kw = {}
    for k in ("n_per_record", "n_shards", "chunk_slots"):
        if k in o:
            kw[k] = int(o[k])
    if "probability" in o:
        kw["probability"] = float(o["probability"])
    for k in ("tag_columns", "id_columns", "payload_columns"):
        if k in o:
            kw[k] = tuple(t for t in o[k].split(",") if t)
    for k in ("text_column", "hash_backend"):
        if k in o:
            kw[k] = o[k]
    return IndexConfig(**kw)


def _ensure_index_dir(path: str, options) -> str:
    """First write to a fresh dir records the IndexConfig (from the
    writer options); later writes fail fast on on-disk format drift.
    Returns the pending/ dir (created)."""
    os.makedirs(path, exist_ok=True)
    cfg_file = os.path.join(path, "config.json")
    if not os.path.exists(cfg_file):
        with open(cfg_file, "w") as f:
            f.write(_options_cfg(options).to_json())
    else:
        _load_cfg(path)
    pend = os.path.join(path, "pending")
    os.makedirs(pend, exist_ok=True)
    return pend


class MdbloomWriter(DataSourceArrowWriter):
    """``df.write.format("mdbloom")`` — the index as a Spark SINK.

    Executors stage the incoming Arrow batches as parquet files under
    ``<path>/_staging/<job>/`` (one file per task); ``commit`` promotes
    them atomically (per-file rename) into ``<path>/pending/``. The
    commit hook runs in Spark's session-less Python plan worker, so it
    deliberately does NO Spark work: the fold into the index —
    ``BloomIndexWriter.build(source, path, resume=True)``, which
    re-fingerprints the source and rebuilds ONLY the shards the new
    rows hash into — runs at the next engine open
    (`BloomIndexReader.__init__`) or via `build.fold_pending`, on the
    real cluster. Reads through this format see pending rows
    immediately (the reader materializes the tail with the Spark-free
    hash mirrors). ``abort`` removes the staging dir, leaving index +
    pending untouched.

    ``mode("append")`` requires the index to own its source (a
    ``source/`` dir maintained by this sink's folds) — appending
    through the sink to an index built directly from a foreign
    DataFrame would make the fold's resume build see only the new rows
    and drop everything else, so that case raises. ``mode("overwrite")``
    replaces config, source and index artifacts.
    """

    def __init__(self, options, schema, overwrite: bool):
        self.path = options["path"]
        self.options = dict(options)
        self.schema = schema
        self.overwrite = overwrite
        import uuid
        self.job = uuid.uuid4().hex
        src = os.path.join(self.path, "source")
        if (not overwrite and os.path.exists(
                os.path.join(self.path, "config.json"))
                and not os.path.exists(src)
                and not _pending_files(self.path)):
            raise ValueError(
                f"index at {self.path} was not built through this sink "
                "(no source/ dir): append would rebuild from the new "
                "rows alone. Use mode('overwrite') or "
                "BloomIndexWriter.build on the full input.")

    def _staging(self) -> str:
        return os.path.join(self.path, "_staging", self.job)

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        batches = list(iterator)
        if not batches:
            return WriterCommitMessage()
        os.makedirs(self._staging(), exist_ok=True)
        f = os.path.join(self._staging(), f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_batches(batches), f,
                       compression="zstd")
        return WriterCommitMessage()

    def commit(self, messages):
        """Runs in Spark's session-less Python plan worker — filesystem
        promotion only, the distributed fold happens at the next engine
        open (see class docstring / build.fold_pending)."""
        import shutil
        if self.overwrite:
            for sub in ("source", "pending", "storage", "slabs",
                        "tombstones", "manifest"):
                shutil.rmtree(os.path.join(self.path, sub),
                              ignore_errors=True)
            try:
                os.remove(os.path.join(self.path, "config.json"))
            except FileNotFoundError:
                pass
        pend = _ensure_index_dir(self.path, self.options)
        staged = self._staging()
        if os.path.exists(staged):
            for f in sorted(os.listdir(staged)):
                os.replace(os.path.join(staged, f), os.path.join(pend, f))
        shutil.rmtree(staged, ignore_errors=True)
        try:  # shared staging parent: only remove when empty
            os.rmdir(os.path.join(self.path, "_staging"))
        except OSError:
            pass

    def abort(self, messages):
        import shutil
        shutil.rmtree(self._staging(), ignore_errors=True)


@dataclass
class _StreamTaskCommit(WriterCommitMessage):
    """One staged parquet file per (microbatch, partition) task."""
    file: str = ""
    pid: int = -1


class MdbloomStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("mdbloom")`` — continuous ingest into the
    index's pending tail.

    Per microbatch: executor tasks stage their Arrow batches as parquet
    under ``<path>/_staging/stream/`` (one file per task, named by
    partition id, path carried in the commit message); ``commit`` —
    Spark's session-less plan worker, so filesystem-only, exactly like
    the batch sink — promotes them to
    ``pending/stream-<batchId>-<pid>.parquet``. Deterministic names +
    a per-batch marker under ``_stream_commits/`` make a retried
    microbatch overwrite rather than duplicate (the jvm hash backend
    additionally dedups identical id rows at fold time via its
    per-(shard, ids) aggregation). Reads through the mdbloom format see
    each committed microbatch immediately (pending tail); the
    distributed fold into index shards runs at each engine open or on
    an explicit `build.fold_pending` cadence — an LSM memtable/compact
    split, complementing `streaming.StreamingNoveltyIngest`
    (foreachBatch + immediate fold) when per-microbatch build latency
    is unwanted. Append output mode only."""

    def __init__(self, options, schema, overwrite: bool):
        if overwrite:
            raise ValueError("mdbloom streaming sink supports append "
                             "output mode only")
        self.path = options["path"]
        self.options = dict(options)
        self.schema = schema

    def _staging(self) -> str:
        return os.path.join(self.path, "_staging", "stream")

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        batches = list(iterator)
        if not batches:
            return _StreamTaskCommit()
        pid = TaskContext.get().partitionId()
        os.makedirs(self._staging(), exist_ok=True)
        f = os.path.join(self._staging(),
                         f"part-{pid:05d}-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_batches(batches), f,
                       compression="zstd")
        return _StreamTaskCommit(file=f, pid=pid)

    def commit(self, messages, batchId: int):
        marker = os.path.join(self.path, "_stream_commits", str(batchId))
        staged = [(m.pid, m.file) for m in messages
                  if m is not None and getattr(m, "file", "")]
        if os.path.exists(marker):  # replayed batch: drop the re-stage
            for _, f in staged:
                try:
                    os.remove(f)
                except FileNotFoundError:
                    pass
            return
        pend = _ensure_index_dir(self.path, self.options)
        for pid, f in staged:
            os.replace(f, os.path.join(
                pend, f"stream-{batchId:012d}-{pid:05d}.parquet"))
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w"):
            pass

    def abort(self, messages, batchId: int):
        for m in messages:
            if m is not None and getattr(m, "file", ""):
                try:
                    os.remove(m.file)
                except FileNotFoundError:
                    pass


class MdbloomDataSource(DataSource):
    """See module docstring. Register with
    ``spark.dataSource.register(MdbloomDataSource)``."""

    @classmethod
    def name(cls):
        return "mdbloom"

    def schema(self):
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema
        path = self.options["path"]
        cfg = _load_cfg(path)  # fail fast on format drift
        keep_filter = \
            self.options.get("include_filter", "").lower() == "true"
        if os.path.isdir(os.path.join(path, "storage")):
            sch = _storage_dataset(path).schema
            names = [n for n in sch.names
                     if n != "filter" or keep_filter]
            return from_arrow_schema(
                pa.schema([sch.field(n) for n in names]))
        # sink-only index, nothing folded yet: derive the storage shape
        # (key, <carry>, [filter,] shard) from config + the pending
        # files' source schema — same column order the build writes
        files = _pending_files(path)
        if not files:
            raise ValueError(f"index at {path} has no storage/ and no "
                             "pending/ rows")
        import pyarrow.dataset as pads
        src = pads.dataset(files, format="parquet").schema
        fields = [pa.field("key", pa.string())]
        fields += [src.field(c) for c in _carry_columns(cfg)]
        if keep_filter:
            fields.append(pa.field("filter", pa.list_(pa.int64())))
        fields.append(pa.field("shard", pa.int32()))
        return from_arrow_schema(pa.schema(fields))

    def reader(self, schema):
        return MdbloomReader(self.options, schema)

    def writer(self, schema, overwrite):
        return MdbloomWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite):
        return MdbloomStreamWriter(self.options, schema, overwrite)
