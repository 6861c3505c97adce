"""Structured Streaming surface for mergeable sketches.

The reference has no streaming at all (SURVEY §2.6); this is the engine's
forward-looking surface: because every sketch state is small, mergeable and
order-independent, a stream reduces to *per-microbatch partials merged into
a running state* — exactly the ``foreachBatch`` accumulation pattern. The
running state is checkpointable by writing its bytes alongside Spark's own
streaming checkpoint.

Also provided: windowed streaming counts with watermarked late-data
handling, built purely from Spark primitives (the declarative path).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mdbloom.spark.aggregate import sketch_all


class StreamingSketch:
    """Running mergeable sketch over a streaming DataFrame.

    Usage::

        acc = StreamingSketch(lambda: HllSketch(14), HllSketch.from_bytes,
                              col="user_id")
        q = acc.start(stream_df)        # foreachBatch accumulation
        ...
        acc.sketch.estimate()

    Exactly-once: merges are idempotent for Bloom/HLL (OR/max), so
    microbatch replays are harmless there even without bookkeeping; for
    CMS/KLL/t-digest a replayed batch would double-count. Passing
    ``ledger_path`` turns on the standard foreachBatch idempotency
    recipe — a (batch_id, state) ledger:

    * after merging batch ``b``, the RUNNING state is written to
      ``ledger_path/batch_<b>.bin`` via tmp+atomic-rename, and the
      in-memory sketch only advances with the ledger (merge happens on a
      copy, swapped in after the write) — a crash mid-write leaves both
      at the pre-batch state;
    * a batch with ``batch_id <= last ledgered id`` is a no-op (Spark
      replays at-least-once the most recent uncommitted batch, always
      with the SAME batch_id — that is the contract this keys on);
    * construction with an existing ledger resumes from the latest
      state, so restart + replay double-counts nothing — PROVIDED the
      query checkpoints: :meth:`start` requires ``checkpoint_dir``
      whenever a ledger is configured, because batch ids only stay
      stable across restarts under a streaming checkpoint (an
      uncheckpointed restart renumbers from 0 and the guard would
      drop real batches as replays).

    Without ``ledger_path`` the accumulator is at-least-once (fine for
    the idempotent sketches).
    """

    def __init__(self, factory: Callable, from_bytes: Callable, col: str,
                 ledger_path: str | None = None):
        self.factory = factory
        self.from_bytes = from_bytes
        self.col = col
        self.sketch = factory()
        self.batches_seen = 0
        self.batches_replayed = 0
        self.ledger_path = ledger_path
        self.last_batch_id = -1
        if ledger_path:
            latest = self._ledger_latest()
            if latest is not None:
                self.last_batch_id, state_bytes = latest
                self.sketch = from_bytes(state_bytes)

    def _ledger_latest(self):
        import os
        if not os.path.isdir(self.ledger_path):
            return None
        ids = [int(f[len("batch_"):-len(".bin")])
               for f in os.listdir(self.ledger_path)
               if f.startswith("batch_") and f.endswith(".bin")]
        if not ids:
            return None
        bid = max(ids)
        with open(os.path.join(self.ledger_path,
                               f"batch_{bid}.bin"), "rb") as f:
            return bid, f.read()

    def _on_batch(self, batch_df: DataFrame, batch_id: int):
        import os
        if self.ledger_path is not None and batch_id <= self.last_batch_id:
            # exactly-once: this batch's rows are already IN the ledgered
            # state — the replay is a no-op
            self.batches_seen += 1
            self.batches_replayed += 1
            return
        part = sketch_all(batch_df, self.col, self.factory, self.from_bytes)
        if self.ledger_path is None:
            self.sketch.merge(part)
        else:
            # transactional advance: merge a COPY, ledger it, then swap —
            # if the write throws, self.sketch still matches the ledger
            nxt = self.from_bytes(self.sketch.to_bytes())
            nxt.merge(part)
            os.makedirs(self.ledger_path, exist_ok=True)
            final = os.path.join(self.ledger_path, f"batch_{batch_id}.bin")
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(nxt.to_bytes())
            os.replace(tmp, final)
            # the ledger only ever needs the LATEST state (replays carry
            # the same id as the batch they replay, never an older one);
            # also sweep any .tmp orphaned by a crash mid-write
            for f in os.listdir(self.ledger_path):
                if f == f"batch_{batch_id}.bin":
                    continue
                if (f.startswith("batch_")
                        and (f.endswith(".bin") or f.endswith(".tmp"))):
                    os.unlink(os.path.join(self.ledger_path, f))
            self.sketch = nxt
            self.last_batch_id = batch_id
        self.batches_seen += 1

    def start(self, stream_df: DataFrame, trigger_once: bool = True,
              checkpoint_dir: str | None = None):
        """Start the accumulation query. With ``ledger_path`` set,
        ``checkpoint_dir`` is REQUIRED: the ledger keys exactly-once on
        Spark's batch ids, and those are only stable across restarts
        when the query itself checkpoints — an uncheckpointed restart
        renumbers batches from 0, which the ledger guard would silently
        treat as replays and drop."""
        if self.ledger_path is not None and checkpoint_dir is None:
            raise ValueError(
                "StreamingSketch(ledger_path=...) needs checkpoint_dir: "
                "batch ids restart at 0 without a streaming checkpoint, "
                "and the exactly-once ledger keys on them")
        writer = stream_df.writeStream.foreachBatch(self._on_batch) \
            .outputMode("update")
        if checkpoint_dir is not None:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def stateful_sketch_by_key(stream_df: DataFrame, key_cols: list[str],
                           col: str, factory: Callable,
                           from_bytes: Callable,
                           estimate: Callable | None = None) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (``applyInPandasWithState``):
    one running mergeable-sketch state per key, updated each microbatch,
    emitting (key..., estimate, n_new) rows in update mode.

    The per-key state is the sketch's canonical bytes — small, mergeable
    and checkpoint-persisted by Spark itself, so a restarted query
    resumes every key's sketch exactly where it left off (state lives in
    the streaming checkpoint; asserted in tests by stopping and
    restarting the query over new input files). This is the streaming
    face of the same partial/final contract the batch UDAFs use
    (mdbloom.spark.aggregate.sketch_by_key)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    types = {f.name: f.dataType.simpleString()
             for f in stream_df.schema.fields}
    out_schema = ", ".join(
        [f"`{k}` {types[k]}" for k in key_cols]
        + ["estimate double", "n_new long"])
    state_schema = "state binary"

    def fn(key, pdfs, state):
        if state.exists:
            sk = from_bytes(bytes(state.get[0]))
        else:
            sk = factory()
        n = 0
        for pdf in pdfs:
            vals = pdf[col].dropna().to_numpy()
            if len(vals):
                sk.update(vals)
                n += len(vals)
        state.update((sk.to_bytes(),))
        row = dict(zip(key_cols, key))
        row["estimate"] = float(estimate(sk)) if estimate else float("nan")
        row["n_new"] = n
        yield pd.DataFrame([row])

    return (stream_df.groupBy(*key_cols)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


class StreamingNoveltyIngest:
    """Online cross-run dedup ingest: a streaming novelty gate in front of
    a growing Bloom index.

    Each microbatch flows through the same content-addressed novelty
    check the batch pipeline runs (`BloomIndexReader.novel_rows`), but
    online and self-feeding:

    1. **in-batch dedup** — one accepted record per content key (first in
       id order), keys computed with the build's own whole-stage-codegen
       filter expressions (`BloomIndexWriter.filters_df`);
    2. **cross-run dedup** — left-anti join of the batch's (shard, key)
       pairs against the live storage keys of the index at ``index_path``
       (shard-partition-pruned scan; the storage parquet carries a key
       bloom filter);
    3. accepted rows **append** to the parquet sink at ``sink_path``;
    4. the index is **extended incrementally**: ``build(resume=True)``
       re-fingerprints the sink and rebuilds ONLY the shards the new rows
       touched (same machinery as
       test_resume_rebuilds_only_changed_shards_and_matches_full).

    A replayed microbatch is a no-op — its keys are already indexed, so
    foreachBatch idempotency falls out of content addressing instead of a
    (batch_id, state) ledger. Reference frame: `ContainerImpl.put`'s
    dedup-on-insert (`FlatBloofi.java:153-154`) lifted to a streaming
    ingest gate.
    """

    def __init__(self, spark, cfg, index_path: str, sink_path: str):
        self.spark = spark
        self.cfg = cfg
        self.index_path = index_path
        self.sink_path = sink_path
        self.batches_seen = 0
        self.accepted_total = 0
        self.rejected_total = 0

    # reserved sink columns carrying each accepted row's content key, so
    # a REPLAYED batch can be rejected against the sink itself even when
    # the crash happened between the sink append and the index rebuild —
    # the sink (not the index) is the idempotency source of truth
    _SHARD_COL = "_novelty_shard"
    _KEY_COL = "_novelty_key"

    def _accept(self, batch_df: DataFrame) -> DataFrame:
        """The novelty gate for one batch (also usable on a static
        DataFrame): returns the accepted subset of ``batch_df`` plus the
        reserved (shard, key) columns the sink persists."""
        import os

        from pyspark.sql import Window

        from mdbloom.spark.build import BloomIndexWriter

        ids = list(self.cfg.id_columns)
        writer = BloomIndexWriter(self.spark, self.cfg)
        keyed = writer.filters_df(batch_df).select(*ids, "shard", "key")
        rn = F.row_number().over(
            Window.partitionBy("key").orderBy(*ids))
        firsts = keyed.withColumn("_rn", rn).where(F.col("_rn") == 1) \
            .drop("_rn")
        if os.path.exists(os.path.join(self.index_path, "config.json")):
            from mdbloom.spark.query import BloomIndexReader
            firsts = BloomIndexReader(self.spark, self.index_path) \
                .filter_novel_keys(firsts)
        if os.path.exists(self.sink_path):
            # keys already ACCEPTED in an earlier (possibly half-failed)
            # batch: reject them even if the index rebuild never ran
            sunk = (self.spark.read.parquet(self.sink_path)
                    .select(F.col(self._SHARD_COL).alias("shard"),
                            F.col(self._KEY_COL).alias("key"))
                    .dropDuplicates(["shard", "key"]))
            firsts = firsts.join(sunk, ["shard", "key"], "left_anti")
        return batch_df.join(
            firsts.select(*ids,
                          F.col("shard").alias(self._SHARD_COL),
                          F.col("key").alias(self._KEY_COL)),
            ids, "inner")

    def _on_batch(self, batch_df: DataFrame, batch_id: int):
        import os

        from mdbloom.spark.build import BloomIndexWriter

        n_in = batch_df.count()
        if not n_in:
            self.batches_seen += 1
            return
        # one materialization: the gate plan (hash pass + window dedup +
        # two anti-joins) would otherwise run twice (count, then write)
        accepted = self._accept(batch_df).localCheckpoint(eager=True)
        n_new = accepted.count()
        if n_new:
            accepted.write.mode("append").parquet(self.sink_path)
        if os.path.exists(self.sink_path):
            # ALWAYS converge the index to the sink (not only when this
            # batch accepted rows): if a previous batch died between its
            # sink append and its rebuild, the replay accepts nothing yet
            # the index is still behind — resume fingerprint-skips every
            # unchanged shard, so a current index makes this a no-op
            BloomIndexWriter(self.spark, self.cfg).build(
                self.spark.read.parquet(self.sink_path)
                .drop(self._SHARD_COL, self._KEY_COL),
                self.index_path, resume=True)
        self.batches_seen += 1
        self.accepted_total += n_new
        self.rejected_total += n_in - n_new

    def start(self, stream_df: DataFrame, trigger_once: bool = True):
        writer = stream_df.writeStream.foreachBatch(self._on_batch) \
            .outputMode("update")
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def windowed_counts(stream_df: DataFrame, ts_col: str, key_col: str,
                    window: str = "5 minutes", slide: str | None = None,
                    watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling/sliding window counts — the declarative
    streaming aggregation path (late rows beyond the watermark dropped)."""
    # event-time must be TIMESTAMP (not NTZ) for watermarking
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = F.window(F.col(ts_col), window, slide) if slide \
        else F.window(F.col(ts_col), window)
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(w, F.col(key_col))
            .agg(F.count("*").alias("n")))
