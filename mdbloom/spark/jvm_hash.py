"""JVM-codegen filter assembly — the scale path for the build hot loop.

The NumPy backend (mdbloom.hashing) is faithful to the north star's
"k-hash loop in NumPy inside pandas UDFs", but moving record text through
Arrow into Python workers is memory-bandwidth-bound: measured on this box,
a pure-JVM explode+hash pass over the same 1M-turn corpus runs ~10x faster
and keeps scaling with cores. This module expresses the ENTIRE per-record
filter build as Spark SQL higher-order functions, fully inside whole-stage
codegen:

    tokens   = array_distinct(tagged tokens + 'tok='-prefixed text words)
    (h1,h2)  = xxhash64(t), xxhash64(t, 1)          # two independent
                                                     # 64-bit streams
    a, b     = pmod(h1, m), pmod(h2, m)
    pos_i    = pmod(a + i*b + tet_i, m)   i < k      # enhanced double
                                                     # hashing (same scheme
                                                     # as mdbloom.hashing)
    word_w   = OR over positions p of (1 << (p & 63)) when p >> 6 == w
    filter   = concat(cast(word_w as binary)...)     # canonical big-endian
    key      = md5(filter)                           # content address

No strings, no Python, nothing but the final packed words leave the JVM.
The driver-side mirror (:class:`JvmTokenHasher`) reproduces positions and
content keys bit-exactly for query planning.
"""

from __future__ import annotations

import hashlib
from functools import reduce

import numpy as np
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from mdbloom.shape import Shape

_U64 = (1 << 64) - 1


def _tet(k: int) -> list[int]:
    return [(i ** 3 - i) // 6 for i in range(k)]


def tokens_col(cfg) -> Column:
    """array<string> of tagged dimension tokens per record, identical
    tokenization to build.record_tokens_pandas (whitespace split, 'col='
    tags, null/'none' tags skipped)."""
    parts = []
    for col in cfg.tag_columns:
        tagged = F.when(
            F.col(col).isNotNull() & (F.col(col) != "none"),
            F.array(F.concat(F.lit(f"{col}="), F.col(col).cast("string")))
        ).otherwise(F.array().cast("array<string>"))
        parts.append(tagged)
    if cfg.text_column:
        words = F.split(F.trim(F.coalesce(F.col(cfg.text_column),
                                          F.lit(""))), r"\s+")
        words = F.filter(words, lambda w: w != "")
        parts.append(F.transform(words, lambda w: F.concat(F.lit("tok="), w)))
    toks = parts[0]
    for p in parts[1:]:
        toks = F.concat(toks, p)
    return F.array_distinct(toks)


def token_hash_cols(toks: Column) -> tuple[Column, Column]:
    """Two array<long> columns of the per-token 64-bit hash pair.

    Note: filter-word assembly is deliberately NOT done in SQL — Spark's
    higher-order functions (transform/aggregate) are interpreted
    (CodegenFallback), and projection collapse re-evaluates the shared
    positions subtree once per output word, which measured ~3x SLOWER than
    the pandas path. The winning split: JVM owns strings (tokenize + hash,
    codegen'd), Python receives only numeric hash arrays and runs the
    k-hash loop + bit packing vectorized in NumPy."""
    return (F.transform(toks, lambda t: F.xxhash64(t)),
            F.transform(toks, lambda t: F.xxhash64(t, F.lit(1))))


def filters_from_hash_batch(h1_lists, h2_lists, shape: Shape) -> np.ndarray:
    """(N,) sequences of per-record hash arrays -> (N, W) packed filters.
    Pure vectorized NumPy: enhanced-double-hashing positions for every
    token, per-token masks, one OR-scatter per record."""
    from mdbloom import bits as B
    n = len(h1_lists)
    out = B.zeros(shape.m, n)
    lens = np.fromiter((len(x) for x in h1_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return out
    flat1 = np.concatenate([np.asarray(x, dtype=np.int64)
                            for x in h1_lists if len(x)])
    flat2 = np.concatenate([np.asarray(x, dtype=np.int64)
                            for x in h2_lists if len(x)])
    pos = gate_positions_batch(flat1, flat2, shape)          # (T, k)
    masks = B.masks_from_positions(pos, shape.m)             # (T, W)
    rows = np.repeat(np.arange(n), lens)
    np.bitwise_or.at(out, rows, masks)
    return out


# ---------------------------------------------------------------- driver mirror

class JvmTokenHasher:
    """Driver-side bit-exact mirror of the JVM expressions, for query
    planning: token -> (h1, h2) via one tiny Spark job (memoized), then
    the same enhanced-double-hashing arithmetic in NumPy."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._hashes: dict[str, tuple[int, int]] = {}

    def _ensure(self, tokens) -> None:
        missing = sorted({t for t in tokens if t not in self._hashes})
        if not missing:
            return
        df = self.spark.createDataFrame([(t,) for t in missing], "t string")
        rows = df.select("t", F.xxhash64("t").alias("h1"),
                         F.xxhash64("t", F.lit(1)).alias("h2")).collect()
        for r in rows:
            self._hashes[r.t] = (r.h1, r.h2)

    def positions(self, tokens, shape: Shape) -> np.ndarray:
        """Sorted distinct bit positions for a token set at ``shape``."""
        tokens = list(tokens)
        if not tokens:
            return np.empty(0, dtype=np.int64)
        self._ensure(tokens)
        m = shape.m
        tet = np.asarray(_tet(shape.k), dtype=np.int64)
        i = np.arange(shape.k, dtype=np.int64)
        out = []
        for t in tokens:
            h1, h2 = self._hashes[t]
            a = h1 % m  # python % == pmod for negative ints
            b = h2 % m
            out.append((a + i * b + tet) % m)
        return np.unique(np.concatenate(out))

    def packed_filter(self, tokens, shape: Shape) -> np.ndarray:
        """Native-endian uint64 packed filter for a token set."""
        from mdbloom import bits as B
        return B.from_bits(self.positions(tokens, shape), shape.m)

    def content_key(self, tokens, shape: Shape) -> str:
        """Canonical content key (md5 of little-endian packed bytes — the
        engine-wide filter byte order, same as bits.content_key)."""
        from mdbloom import bits as B
        return B.content_key(self.packed_filter(tokens, shape))


def gate_positions_batch(h1s: np.ndarray, h2s: np.ndarray,
                         shape: Shape) -> np.ndarray:
    """(U, k) positions from raw xxhash64 pairs (numeric gate build)."""
    m = shape.m
    tet = np.asarray(_tet(shape.k), dtype=np.int64)[None, :]
    i = np.arange(shape.k, dtype=np.int64)[None, :]
    a = np.mod(h1s.astype(np.int64), m)[:, None]
    b = np.mod(h2s.astype(np.int64), m)[:, None]
    return (a + i * b + tet) % m
