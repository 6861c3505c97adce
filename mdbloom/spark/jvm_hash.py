"""JVM-codegen filter assembly — the scale path for the build hot loop.

The NumPy backend (mdbloom.hashing) is faithful to the north star's
"k-hash loop in NumPy inside pandas UDFs", but streaming position/mask
math through Python workers is memory-bandwidth-bound: measured on this
box, 32 parallel workers achieve LOWER aggregate token throughput than
one. This module therefore expresses the ENTIRE per-record filter build
as scalar Spark SQL expressions inside whole-stage codegen
(:func:`aggregated_filter_words`):

    tokens   = array_distinct(tagged tokens + 'tok='-prefixed text words)
    (h1,h2)  = xxhash64(t), xxhash64(t, 1)          # two independent
                                                     # 64-bit streams
    a, b     = pmod(h1, m), pmod(h2, m)
    pos_i    = pmod(a + i*b + tet_i, m)   i < k      # enhanced double
                                                     # hashing (same scheme
                                                     # as mdbloom.hashing)
    word_w   = bit_or over tokens of
               OR_i IF(pos_i div 64 = w, 1L << (pos_i % 64), 0L)
    filter   = unhex(hex(bswap(word_w))...)          # canonical little-
                                                     # endian packed bytes
    key      = md5(filter)                           # content address

No per-row Python anywhere; nothing but the final packed rows leave the
JVM. The driver-side mirror (:class:`JvmTokenHasher`) reproduces
positions and content keys bit-exactly for query planning.
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


def tokens_col(cfg, available: set | None = None) -> Column:
    """array<string> of tagged dimension tokens per record, identical
    tokenization to build.record_tokens_pandas (whitespace split, 'col='
    tags, null/'none' tags skipped). ``available``: the input DataFrame's
    column set — configured tag columns absent from it are skipped, like
    the pandas backend's ``if col not in pdf.columns`` guard. The 'none'
    compare runs on the STRING cast (a raw compare against a non-string
    tag column would crash under ANSI or null out under non-ANSI,
    silently dropping every token of that dimension)."""
    parts = []
    for col in cfg.tag_columns:
        if available is not None and col not in available:
            continue
        sv = F.col(col).cast("string")
        tagged = F.when(
            sv.isNotNull() & (sv != "none"),
            F.array(F.concat(F.lit(f"{col}="), sv))
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


# ------------------------------------------------------- full-JVM assembly
#
# Measured on this box (32-core single-socket VM): streaming-NumPy position
# math inside pandas UDFs is MEMORY-BANDWIDTH-bound — 32 parallel workers
# achieve LOWER aggregate token throughput than one (0.7us -> 30us/token),
# so the pandas hash pass cannot scale no matter how it is batched. The
# same arithmetic expressed as scalar Spark SQL expressions runs inside
# whole-stage codegen with every intermediate in a CPU register: DRAM
# traffic is just token bytes in, W words out, and throughput scales with
# cores. This is the honest 100 TB shape: per-core memory bandwidth is the
# scarce resource on real executors too.
#
# Pipeline (all codegen, zero Python):
#   explode(tokens)                         -> one row per (record, token)
#   h1, h2      = xxhash64(t), xxhash64(t, 1)
#   pos_i       = pmod(pmod(h1,m) + i*pmod(h2,m) + tet_i, m)   i < k
#   _w{w}       = OR over i of IF(pos_i div 64 = w,
#                                 shiftleft(1L, pos_i % 64), 0L)
#   groupBy(shard, ids).agg(bit_or(_w{w}))  -> packed words per record
#                                              (map-side partial combine)
# Records with NO tokens survive via explode_outer + a null guard (zero
# filter — same semantics as putting an empty hasher).


_BSWAP_M8 = 71777214294589695     # 0x00FF00FF00FF00FF
_BSWAP_M16 = 281470681808895      # 0x0000FFFF0000FFFF


def _bswap64_sql(col: str) -> str:
    """SQL byte-swap of a long (3 mask/shift rounds, pure codegen, no
    allocations): cast(bswap(w) as binary) == the word's LITTLE-endian
    bytes, i.e. the engine's canonical filter byte order (mdbloom.bits)."""
    a = (f"(shiftleft(({col}) & {_BSWAP_M8}, 8) | "
         f"(shiftrightunsigned({col}, 8) & {_BSWAP_M8}))")
    b = (f"(shiftleft({a} & {_BSWAP_M16}, 16) | "
         f"(shiftrightunsigned({a}, 16) & {_BSWAP_M16}))")
    return f"(shiftleft({b}, 32) | shiftrightunsigned({b}, 32))"


def filter_binary_sql(n_words: int) -> str:
    """SQL expression assembling the canonical little-endian packed filter
    binary from the `_w0.._w{W-1}` word columns — so the content key
    (md5 of these bytes) and the at-rest `filter` column are produced
    entirely JVM-side, byte-identical to bits.to_bytes/content_key.
    (hex/unhex instead of cast-to-binary: ANSI mode forbids the latter;
    hex of the byte-swapped word is exactly the little-endian byte hex.)"""
    parts = ", ".join(f"lpad(hex({_bswap64_sql(f'_w{w}')}), 16, '0')"
                      for w in range(n_words))
    return f"unhex(concat({parts}))"


def positions_array_sql(shape: Shape) -> str:
    """SQL `array<long>` of the k bit positions of token column `_t` via
    enhanced double hashing — identical arithmetic to
    :meth:`JvmTokenHasher.positions` and mdbloom.hashing. Null token (a
    record with no dimensions) maps to an empty array."""
    m, k = shape.m, shape.k
    tet = [t % m for t in _tet(k)]  # ONE tetrahedral-term source
    pos = ", ".join(
        f"pmod(pmod(xxhash64(_t), {m}) + {i} * pmod(xxhash64(_t, 1), {m})"
        f" + {tet[i]}, {m})" for i in range(k))
    return f"if(_t is null, array(), array({pos}))"


def exploded_token_rows(sharded_df, cfg, id_cols) -> "DataFrame":
    """(shard, *ids, _t): one codegen'd row per record token; token-less
    records yield a single null-token row (explode_outer)."""
    return sharded_df.select(
        "shard", *id_cols,
        F.explode_outer(
            tokens_col(cfg, set(sharded_df.columns))).alias("_t"))


def aggregated_filter_words(sharded_df, cfg, id_cols) -> "DataFrame":
    """(shard, *ids, _w0.._w{W-1}): one row per record with its packed
    filter words, built entirely JVM-side.

    The whole chain — explode(tokens) -> explode(k positions) ->
    partial bit_or aggregation — is ONE whole-stage-codegen pipeline:
    position values flow generator -> aggregate in registers without ever
    materializing per-record arrays. The caller (build.filters_df)
    repartitions the RAW records by shard before this runs, so the wide
    exchange carries input rows pre-explode and the aggregation itself is
    exchange-free (hash(shard) already satisfies its clustering).
    Token-less records survive as all-zero filters (null `_p` rows:
    every IF picks 0)."""
    shape = cfg.shape
    m, k = shape.m, shape.k
    n_words = (m + 63) >> 6
    rows = exploded_token_rows(sharded_df, cfg, id_cols)
    if k * n_words <= 160:
        # per-TOKEN word assembly: one row per token reaches the
        # aggregate (k× fewer group probes than exploding positions —
        # measured ~2x faster end-to-end at this shape). The k position
        # columns are materialized once in a projection; each word is a
        # k-term IF/shiftleft OR-chain. Guarded by k*W so the generated
        # method stays well under the JVM codegen limits.
        tet = [t % m for t in _tet(k)]  # ONE tetrahedral-term source
        # null token (a token-less record's explode_outer row) -> sentinel
        # position -64, whose `div 64` is -1 and matches no word: such
        # records aggregate to the all-zero filter. (xxhash64(null) would
        # otherwise return a seed hash and set phantom bits.)
        pos_cols = [F.expr(f"if(_t is null, -64L, "
                           f"pmod(pmod(xxhash64(_t), {m}) + "
                           f"{i} * pmod(xxhash64(_t, 1), {m}) + {tet[i]}, "
                           f"{m}))").alias(f"_p{i}") for i in range(k)]
        staged = rows.select("shard", *id_cols, *pos_cols)
        words = staged.select("shard", *id_cols, *[
            F.expr("|".join(
                f"if(_p{i} div 64 = {w}, shiftleft(1L, int(_p{i} % 64)), 0L)"
                for i in range(k))).alias(f"_w{w}")
            for w in range(n_words)])
        return words.groupBy("shard", *id_cols).agg(
            *[F.expr(f"bit_or(_w{w})").alias(f"_w{w}")
              for w in range(n_words)])
    # large shapes: explode the k positions instead (k× more agg rows but
    # O(1) expression size per word — no codegen-size cliff)
    pos_rows = rows.select(
        "shard", *id_cols,
        F.explode_outer(F.expr(positions_array_sql(shape))).alias("_p"))
    return pos_rows.groupBy("shard", *id_cols).agg(
        *[F.expr(f"bit_or(if(_p div 64 = {w}, "
                 f"shiftleft(1L, int(_p % 64)), 0L))").alias(f"_w{w}")
          for w in range(n_words)])


# ---------------------------------------------------------------- driver mirror

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _U64


def _xxh64(data: bytes, seed: int) -> int:
    """Reference XXH64 over ``data`` (unsigned result) — the same
    algorithm Spark's ``xxhash64`` runs (XxHash64.hashUnsafeBytes /
    hashLong), so the driver can plan queries without a hash job.
    Verified bit-for-bit against ``F.xxhash64`` in
    tests/test_bits_kernel.py."""
    import struct
    seed &= _U64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _U64
        v2 = (seed + _P2) & _U64
        v3 = seed
        v4 = (seed - _P1) & _U64
        while i + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + l1 * _P2) & _U64, 31) * _P1) & _U64
            v2 = (_rotl((v2 + l2 * _P2) & _U64, 31) * _P1) & _U64
            v3 = (_rotl((v3 + l3 * _P2) & _U64, 31) * _P1) & _U64
            v4 = (_rotl((v4 + l4 * _P2) & _U64, 31) * _P1) & _U64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _U64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _U64, 31) * _P1) & _U64
            h = (h * _P1 + _P4) & _U64
    else:
        h = (seed + _P5) & _U64
    h = (h + n) & _U64
    while i + 8 <= n:
        k, = struct.unpack_from("<Q", data, i)
        k = (_rotl((k * _P2) & _U64, 31) * _P1) & _U64
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _U64
        i += 8
    if i + 4 <= n:
        k, = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ ((k * _P1) & _U64), 23) * _P2 + _P3) & _U64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _U64), 11) * _P1) & _U64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _U64
    h ^= h >> 29
    h = (h * _P3) & _U64
    h ^= h >> 32
    return h


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_pair(token: str) -> tuple[int, int]:
    """The (h1, h2) = (xxhash64(t), xxhash64(t, 1)) pair exactly as the
    build's SQL expressions compute it: h1 = XXH64(utf8, seed=42); the
    second column chains — the IntegerType literal 1 is hashed (4 LE
    bytes, Spark's hashInt) with h1 as the seed. Signed-long results,
    matching Spark (empirically verified incl. multibyte UTF-8)."""
    import struct
    h1 = _xxh64(token.encode("utf-8"), 42)
    h2 = _xxh64(struct.pack("<i", 1), h1)
    return _signed(h1), _signed(h2)


class JvmTokenHasher:
    """Driver-side bit-exact mirror of the JVM expressions, for query
    planning: token -> (h1, h2) via the local XXH64 mirror (no Spark
    job — a batch's whole plan stays driver-resident, the serial-
    fraction shape a 1000-executor cluster needs), then the same
    enhanced-double-hashing arithmetic in NumPy."""

    # same open-vocabulary cap as hashing.TokenMaskCache.MAX_ENTRIES: a
    # long-lived driver serving id-like query tokens must not grow the
    # memo unboundedly
    MAX_ENTRIES = 1 << 20

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._hashes: dict[str, tuple[int, int]] = {}

    def _ensure(self, tokens) -> None:
        toks = [t for t in tokens if t not in self._hashes]
        if len(self._hashes) + len(toks) > self.MAX_ENTRIES:
            self._hashes.clear()
        for t in toks:
            self._hashes[t] = spark_xxhash64_pair(t)

    def _ensure_spark(self, tokens) -> None:
        """The retired job-based path, kept for the parity test."""
        missing = sorted({t for t in tokens if t not in self._hashes})
        if not missing:
            return
        df = self.spark.createDataFrame([(t,) for t in missing], "t string")
        rows = df.select("t", F.xxhash64("t").alias("h1"),
                         F.xxhash64("t", F.lit(1)).alias("h2")).collect()
        for r in rows:
            self._hashes[r.t] = (r.h1, r.h2)

    def hash_pairs(self, tokens) -> tuple:
        """Raw (h1s, h2s) int64 xxhash64 pairs for a token list — the
        shape-independent inputs to gate_positions_batch, so callers can
        probe gates of ANY shape (the manifest tree's population-sized
        node gates each have their own m/k)."""
        tokens = list(tokens)
        self._ensure(tokens)
        h1s = np.array([self._hashes[t][0] for t in tokens],
                       dtype=np.int64)
        h2s = np.array([self._hashes[t][1] for t in tokens],
                       dtype=np.int64)
        return h1s, h2s

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
