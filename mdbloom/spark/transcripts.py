"""Deterministic synthetic multi-turn transcripts (FIXTURES.md §1).

Schema = BASELINE.json ``input_hint``:
    conv_id string, turn_idx int32, role string, text string,
    tool string, ts timestamp

All randomness is *counter-based* (SplitMix64 of (seed, conv_idx, turn_idx,
field, draw)) — no sequential RNG state — so output is bit-identical for
any partitioning, parallelism, or execution order. That is what makes the
per-turn text-equality invariant ("per-row invariant vs the reference:
per-turn text equality under stable turn ordering") checkable across runs
and cluster sizes, and what makes the N-vs-4N scaling comparison read the
exact same input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mdbloom.sketches.common import splitmix64

VOCAB_SIZE = 5000
ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
ROLE_CDF = np.array([0.40, 0.80, 0.85, 1.00])
TOOLS = np.array(["Bash", "Read", "Write", "Grep", "Edit", "WebSearch",
                  "none"], dtype=object)
BASE_TS = np.datetime64("2026-01-01T00:00:00")

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


def _u01(key: np.ndarray) -> np.ndarray:
    """Counter-based uniform [0,1) from int64 keys."""
    return splitmix64(key.astype(np.uint64)).astype(np.float64) / 2.0**64


def _field_key(seed, conv, turn, field, draw=0):
    old = np.seterr(over="ignore")
    try:
        k = (conv.astype(np.uint64) * np.uint64(0x100000)
             + turn.astype(np.uint64) * np.uint64(0x100)
             + np.uint64(field) + np.uint64(draw) * np.uint64(0x10000000000))
        return k ^ splitmix64(np.full(k.shape, seed, dtype=np.uint64))
    finally:
        np.seterr(**old)


def _gen_for_convs(conv_idx: np.ndarray, seed: int) -> pd.DataFrame:
    """Generate all turns for a batch of conversation indices (vectorized)."""
    # conv length in [8, 24] (mean ~16, FIXTURES n_convs = rows/16)
    lens = (8 + np.floor(_u01(_field_key(seed, conv_idx,
                                         np.zeros_like(conv_idx), 0)) * 17)
            ).astype(np.int64)
    conv_rep = np.repeat(conv_idx, lens)
    turn = np.concatenate([np.arange(l, dtype=np.int64) for l in lens]) \
        if len(lens) else np.empty(0, dtype=np.int64)

    # role: weighted categorical
    u_role = _u01(_field_key(seed, conv_rep, turn, 1))
    role = ROLES[np.searchsorted(ROLE_CDF, u_role, side="right").clip(0, 3)]

    # tool: null for user/system; else uniform choice
    u_tool = _u01(_field_key(seed, conv_rep, turn, 2))
    tool = TOOLS[(u_tool * len(TOOLS)).astype(np.int64).clip(0, len(TOOLS) - 1)]
    tool = np.where((role == "user") | (role == "system"), None, tool)

    # text: 5..40 tokens, Zipf-ish ranks (u^3 skews mass to low ranks)
    n_tok = (5 + np.floor(_u01(_field_key(seed, conv_rep, turn, 3)) * 36)
             ).astype(np.int64)
    tok_conv = np.repeat(conv_rep, n_tok)
    tok_turn = np.repeat(turn, n_tok)
    tok_draw = np.concatenate([np.arange(c, dtype=np.int64) for c in n_tok]) \
        if len(n_tok) else np.empty(0, dtype=np.int64)
    u_tok = _u01(_field_key(seed, tok_conv, tok_turn, 4, 0)
                 ^ splitmix64(tok_draw.astype(np.uint64)))
    ranks = (VOCAB_SIZE * u_tok ** 3).astype(np.int64).clip(0, VOCAB_SIZE - 1)
    words = np.char.add("w", np.char.zfill(ranks.astype(str), 5))
    bounds = np.zeros(len(n_tok) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=bounds[1:])
    joined = np.array(
        [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(len(n_tok))],
        dtype=object)

    # ts: base + conv_offset(minutes) + 7s * turn_idx
    ts = (BASE_TS + (conv_rep * 60).astype("timedelta64[s]")
          + (turn * 7).astype("timedelta64[s]"))

    return pd.DataFrame({
        "conv_id": np.char.add("conv", np.char.zfill(conv_rep.astype(str), 8)),
        "turn_idx": turn.astype(np.int32),
        "role": role,
        "text": joined,
        "tool": tool,
        "ts": ts,
    })


def synthesize_transcripts(spark: SparkSession, n_turns: int,
                           seed: int = 42,
                           n_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic transcripts: ~``n_turns`` rows across
    ``n_turns/16`` conversations. Same (seed, n_turns) => bit-identical
    table regardless of parallelism."""
    n_convs = max(1, n_turns // 16)
    n_partitions = n_partitions or max(
        4, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_convs, numPartitions=n_partitions)
    seed_ = int(seed)

    def gen(iterator):
        for pdf in iterator:
            if len(pdf):
                yield _gen_for_convs(pdf["id"].to_numpy(), seed_)

    return base.mapInPandas(gen, schema=SCHEMA)


def synthesize_transcripts_pandas(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side (no Spark) variant for unit tests and oracles —
    bit-identical to the distributed output."""
    n_convs = max(1, n_turns // 16)
    return _gen_for_convs(np.arange(n_convs, dtype=np.int64), seed)


def with_shard(df: DataFrame, n_shards: int) -> DataFrame:
    """Shard assignment: pmod(xxhash64(conv_id), n_shards) — JVM-side,
    deterministic, keeps every turn of a conversation in one shard
    (FIXTURES §1 partitioning spec)."""
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("conv_id")),
                        F.lit(n_shards)).cast("int"))


def conversation_rollup(df: DataFrame, conv_col: str = "conv_id",
                        turn_col: str = "turn_idx", text_col: str = "text",
                        role_col: str = "role",
                        tool_col: str = "tool") -> DataFrame:
    """Per-conversation rollup with an ORDER-PINNED text fingerprint —
    the north rule's 'per-turn text equality under stable (conv_id,
    turn_idx) ordering' invariant expressed as a queryable operator:
    ``text_fp = md5(texts joined by \\x01 in turn_idx order)``, so ANY
    reordering, drop, duplication, or single-character drift in any turn
    changes the conversation's fingerprint. One hash-aggregate (one
    shuffle on conv_col); collect_list is per-conversation (bounded by
    the longest conversation, not the corpus) and array_sort pins the
    order independent of partitioning — the aggregate itself is
    order-independent, so the result is identical at any parallelism.

    Reference frame: the reference has no transcript layer (its unit is
    one Bloom filter, `ContainerImpl.java:155-182`); this is the corpus-
    integrity operator a 10^12-turn ingest needs before trusting any
    index built over it."""
    ordered = F.array_sort(F.collect_list(F.struct(turn_col, text_col)))
    # NULL-text parity with the ANSI oracle (ADVICE r4): string_agg skips
    # NULL texts (as array_join does) but returns NULL — not '' — when
    # EVERY text is NULL, so md5(NULL) is NULL. Guard on the non-null
    # count so an all-NULL conversation fingerprints as NULL both sides.
    fp = F.when(
        F.count(text_col) > 0,
        F.md5(F.array_join(
            F.transform(ordered, lambda s: s[text_col]), "\x01")))
    return (df.groupBy(conv_col)
            .agg(F.count("*").alias("n_turns"),
                 F.countDistinct(role_col).alias("n_roles"),
                 F.count(tool_col).alias("n_tool_turns"),
                 F.sum(F.length(text_col)).alias("chars"),
                 fp.alias("text_fp")))


def conversation_windows(df: DataFrame, k: int = 4,
                         conv_col: str = "conv_id",
                         turn_col: str = "turn_idx",
                         text_col: str = "text") -> DataFrame:
    """Sliding context-window assembly — the training-data op that turns
    a flat turn table into per-turn model contexts: for every turn, the
    texts of the last ``k`` turns of its conversation (frame-bounded,
    turn_idx order), exposed as (n_ctx_turns, ctx_chars, ctx_fp) with
    ``ctx_fp = md5(texts joined by \\x01)`` so the oracle pins every
    byte of every window without shipping the windows themselves.

    One shuffle (partitionBy conv); the frame is ROWS BETWEEN k-1
    PRECEDING AND CURRENT ROW, so state per row is bounded by k and the
    longest conversation bounds a partition — no corpus-wide sort. At
    10^12 turns this is the same plan: hash-partition on conv_id, sort
    within partitions, single windowed pass."""
    from pyspark.sql.window import Window
    w = (Window.partitionBy(conv_col).orderBy(turn_col)
         .rowsBetween(-(k - 1), Window.currentRow))
    ctx_arr = F.collect_list(text_col).over(w)
    ctx = F.array_join(ctx_arr, "\x01")
    # frame ROW count (count(lit(1)) ≡ SQL COUNT(*) OVER w) — NOT
    # size(ctx_arr): collect_list drops NULL texts, COUNT(*) does not,
    # and the oracle counts rows
    # NULL-text parity with windowed string_agg (ADVICE r4): an all-NULL
    # frame yields string_agg = NULL, so LENGTH and md5 are NULL — guard
    # both derived columns on the frame's non-null text count.
    has_text = F.count(text_col).over(w) > 0
    return df.select(
        F.col(conv_col), F.col(turn_col),
        F.count(F.lit(1)).over(w).cast("long").alias("n_ctx_turns"),
        F.when(has_text, F.length(ctx)).cast("long").alias("ctx_chars"),
        F.when(has_text, F.md5(ctx)).alias("ctx_fp"))


def sft_pairs(df: DataFrame, conv_col: str = "conv_id",
              turn_col: str = "turn_idx", role_col: str = "role",
              text_col: str = "text") -> DataFrame:
    """(prompt, response) pair extraction for supervised fine-tuning:
    every assistant turn whose immediately preceding turn (same
    conversation, turn order) is a user turn. One window lag over the
    conv partition — same shuffle/frame shape as
    :func:`conversation_windows`, so the 10^12-turn plan is one
    hash-partition + in-partition sort. Pairs are emitted as
    (conv, turn, prompt_chars, response_chars, pair_fp) with
    ``pair_fp = md5(prompt || \\x01 || response)`` pinning both texts."""
    from pyspark.sql.window import Window
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    # materialize the lags BEFORE filtering — a window expression used
    # after the .where() would re-evaluate over the filtered frame and
    # silently pair each response with the previous PAIR's response
    return (df.select(F.col(conv_col), F.col(turn_col),
                      F.col(role_col),
                      F.lag(role_col).over(w).alias("__pr"),
                      F.lag(text_col).over(w).alias("__pt"),
                      F.col(text_col))
            .where((F.col(role_col) == "assistant")
                   & (F.col("__pr") == "user"))
            .select(conv_col, turn_col,
                    F.length("__pt").cast("long").alias("prompt_chars"),
                    F.length(text_col).cast("long")
                    .alias("response_chars"),
                    # F.concat propagates NULL like SQL || — concat_ws
                    # would silently skip a NULL prompt/response and
                    # diverge from the oracle
                    F.md5(F.concat(F.col("__pt"), F.lit("\x01"),
                                   F.col(text_col)))
                    .alias("pair_fp")))


def tool_transitions(df: DataFrame, conv_col: str = "conv_id",
                     turn_col: str = "turn_idx", role_col: str = "role",
                     tool_col: str = "tool") -> DataFrame:
    """Tool-usage transition mining over agent transcripts: for every
    pair of CONSECUTIVE tool-bearing turns in a conversation (turn
    order), count the (prev_tool, tool) transition across the corpus —
    the bigram statistics an agent-behavior analysis starts from
    (which tool follows which, loop detection, planner drift). One
    window lag per conv partition + one hash-aggregate with map-side
    combine; NULL-tool turns (user/system) are dropped BEFORE the lag,
    so transitions skip over them (assistant Bash -> user -> assistant
    Read counts as Bash -> Read)."""
    from pyspark.sql.window import Window
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    tooled = df.where(F.col(tool_col).isNotNull())
    return (tooled
            .select(F.col(conv_col),
                    F.lag(tool_col).over(w).alias("prev_tool"),
                    F.col(tool_col))
            .where(F.col("prev_tool").isNotNull())
            .groupBy("prev_tool", tool_col)
            .agg(F.count("*").alias("n_transitions"),
                 F.countDistinct(conv_col).alias("n_convs")))
