"""SparkSession factory with the engine's required configuration.

Everything here is standard public Spark configuration: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for vectorized
Python UDF transport, UTC session time zone so DuckDB oracle comparisons
don't drift.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "mdbloom", master: str | None = None,
              shuffle_partitions: int | None = None,
              ui: bool = False, extra: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    n_local = master[master.find("[") + 1: master.find("]")] if "[" in master else str(cpus)
    parallelism = cpus if n_local == "*" else int(n_local)
    shuffle_partitions = shuffle_partitions or max(parallelism, 4)
    b = (
        SparkSession.builder.master(master).appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.driver.memory", os.environ.get("MDBLOOM_DRIVER_MEM", "16g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # The engine's wide generated expressions (k*W-term filter-word
        # assembly, 64-column SimHash votes, slab-SQL word ANDs) can pump
        # a whole-stage-codegen method past HotSpot C2's
        # DontCompileHugeMethods threshold (8000 bytecodes): the JVM then
        # refuses to JIT it and the fused mega-method runs in the BYTECODE
        # INTERPRETER — measured 3-5x SLOWER than Spark's non-fused path
        # (filter hash pass at 200k turns: 11-15s fused-interpreted vs
        # 2.4-3.9s split). Spark's own fallback only trips at 65535, so
        # align it with the JIT's real limit: stages whose generated method
        # would exceed 8000 bytecodes fall back to compiled expression
        # classes automatically; everything smaller still fuses.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # the mdbloom Python data source (datasource.py) prunes shards /
        # keys inside the source via pushFilters — off by default in 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    if os.environ.get("MDBLOOM_JVM_PRETOUCH") == "1":
        # Fault-path mitigation (measured on this sandbox, BENCH.md): the
        # host backs FRESH pages at only ~0.2-2 GB/s regardless of thread
        # count, while already-faulted pages stream at ~75 GB/s. Committing
        # and pre-touching the whole heap once at startup (Xms=Xmx +
        # AlwaysPreTouch, madvised THP so it faults 2 MiB at a time) moves
        # every heap fault out of the measured build/query phases, and G1
        # never uncommits (so never re-faults) a fully-committed heap. On a
        # real cluster this is the standard long-lived-executor posture —
        # executors fault their heap once per process, not per job.
        mem = os.environ.get("MDBLOOM_DRIVER_MEM", "16g")
        b = b.config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages")
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def rebalance_input(df, min_parts: int | None = None):
    """Guard against under-parallel scans. A small input that arrives as a
    single file/row group cannot be split by the scan, so every downstream
    narrow stage (explode, tokenize, signature build) serializes on ONE
    core no matter how many the session has. Rebalance ONLY when the scan
    yields fewer partitions than the session's parallelism — at production
    scale inputs carry orders of magnitude more splits than cores, the
    branch is not taken, and no exchange enters the plan. Catalyst still
    pushes filters/pruning through the inserted Repartition."""
    if df.isStreaming:  # .rdd is undefined for streaming plans; micro-
        return df       # batches are already sized by the source
    min_parts = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


def release_checkpoint(df) -> None:
    """Free a ``localCheckpoint()`` result's cached blocks NOW instead of
    waiting for JVM GC + ContextCleaner. ``df.rdd.unpersist()`` is a
    silent no-op — it unpersists a freshly derived python-facing RDD,
    not the blocks, which belong to the checkpointed plan's internal
    LogicalRDD (verified against getPersistentRDDs). Best-effort: on
    anything that is not a checkpoint result this does nothing."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # blocks fall back to ContextCleaner lifetime
