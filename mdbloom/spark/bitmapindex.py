"""Distributed EWAH bitmap index — the compressed-bitmap operator surface
(SURVEY §2.4 F8) run AT SCALE rather than only as local kernels.

The reference wires its EWAH dependency into filters wholesale
(`EWAHBloomFilter.java:31-44`: compressed bitsets "for large filters with
relatively low k") and merges them with FastAggregation multi-way ORs
(`FastAggregation.java:287-313`). This module is the Spark-native
re-expression of that role: a classic *bitmap index* over a dense integer
key (one bitmap of key-positions per group value), where every bitmap that
crosses an executor boundary travels RUN-LENGTH COMPRESSED (the
``EwahBitmap`` wire format) and every merge streams over segments without
decompression.

Scale shape (the 100 TB story):

1. one hash-aggregate dedups ``(group, key)`` pairs — map-side partial
   combine, the only data-scale shuffle;
2. ``mapInPandas`` turns each Arrow batch into *partial* compressed
   bitmaps (one per group seen in the batch) — output is metadata-sized
   (segments, not rows) from this point on;
3. one ``groupBy(group)`` over the partials ORs them with the log-depth
   ``or_many`` tree — compressed in, compressed out, `FastAggregation`'s
   role on a shuffle instead of a heap;
4. pairwise AND/OR/XOR set algebra runs on the K final bitmaps (K =
   group cardinality, metadata scale) — the same place the engine
   computes sketch finals.

Keys must be dense integers (bit positions). Real corpora dictionary-
encode first — exactly what a warehouse bitmap index does; at 10^12 rows
the dictionary is a precomputed dimension, so this module takes the
domain size as an argument instead of hiding a global sort.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

from mdbloom import bits as B
from mdbloom.ewah import EwahBitmap

_PARTIAL_SCHEMA = StructType([
    StructField("group", StringType(), False),
    StructField("bm", BinaryType(), False),
])

_MERGED_SCHEMA = StructType([
    StructField("group", StringType(), False),
    StructField("bm", BinaryType(), False),
    StructField("card", LongType(), False),
])

PAIR_SCHEMA = StructType([
    StructField("type_a", StringType(), False),
    StructField("type_b", StringType(), False),
    StructField("card_a", LongType(), False),
    StructField("card_b", LongType(), False),
    StructField("inter_card", LongType(), False),
    StructField("union_card", LongType(), False),
    StructField("xor_card", LongType(), False),
])


def group_bitmaps(df: DataFrame, group_col: str, key_col: str,
                  n_positions: int) -> DataFrame:
    """One EWAH-compressed bitmap per ``group_col`` value marking which
    ``key_col`` positions (dense ints in ``[0, n_positions)``) appear.

    Returns ``(group string, bm binary, card long)`` — ``bm`` is the
    ``EwahBitmap`` wire format, ``card`` its popcount (computed on the
    compressed form). Stages 1-3 of the module docstring.
    """
    m = int(n_positions)
    n_w = B.n_words(m)

    pairs = (df.select(F.col(group_col).cast("string").alias("group"),
                       F.col(key_col).cast("long").alias("pos"))
             .where(F.col("pos").isNotNull() & (F.col("pos") >= 0)
                    & (F.col("pos") < m))
             .distinct())

    def to_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for g, sub in pdf.groupby("group", sort=False):
                packed = B.from_bits(sub["pos"].to_numpy(np.int64), m)
                rows.append((g, EwahBitmap.from_dense(packed).to_bytes()))
            yield pd.DataFrame(rows, columns=["group", "bm"])

    partials = pairs.mapInPandas(to_partials, schema=_PARTIAL_SCHEMA)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = EwahBitmap.or_many(
            [EwahBitmap.from_bytes(b) for b in pdf["bm"]])
        if merged.n_words != n_w:
            raise ValueError("partial bitmap width drifted")
        return pd.DataFrame([(pdf["group"].iloc[0], merged.to_bytes(),
                              merged.cardinality())],
                            columns=["group", "bm", "card"])

    return partials.groupBy("group").applyInPandas(merge, _MERGED_SCHEMA)


def set_algebra_pairs(spark: SparkSession, df: DataFrame, group_col: str,
                      key_col: str, n_positions: int) -> DataFrame:
    """Exact pairwise set algebra between every two group bitmaps:
    ``|A|, |B|, |A AND B|, |A OR B|, |A XOR B|`` — each computed by the
    streaming segment ops (`ewah._binop`), cardinalities popcounted per
    segment, never materializing a dense bitmap. Stage 4: the K final
    compressed bitmaps are metadata (K = group cardinality), so the
    pairing runs driver-side like every sketch final."""
    finals = group_bitmaps(df, group_col, key_col, n_positions).collect()
    bms = {r["group"]: (EwahBitmap.from_bytes(r["bm"]), int(r["card"]))
           for r in finals}
    names = sorted(bms)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ba, ca = bms[a]
            bb, cb = bms[b]
            rows.append((a, b, ca, cb, (ba & bb).cardinality(),
                         (ba | bb).cardinality(), (ba ^ bb).cardinality()))
    return spark.createDataFrame(rows, PAIR_SCHEMA)
