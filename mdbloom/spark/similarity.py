"""Embedding similarity search over an ``array<float>`` column.

Two paths, per the standard large-corpus playbook:
  * **brute force** — exact cosine top-k, JVM-side only (zip_with +
    aggregate fold, whole-stage codegen); the correctness baseline and
    perfectly adequate when the probe count is small (one scan per probe
    batch, no shuffle except the top-k);
  * **LSH-bucketed** — random-hyperplane signatures (Charikar 2002) built
    in one vectorized NumPy pass; at query time only buckets matching the
    probe's signature within ``multiprobe`` flipped bits are re-ranked
    exactly. At 100 TB this is the scan-avoiding scale path: the signature
    table is a tiny fraction of the vectors and candidates are an equi-join
    on the bucket key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mdbloom.sketches.common import splitmix64


def _dot(col_a, col_b):
    return F.aggregate(F.zip_with(col_a, col_b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_scores(df: DataFrame, probe: np.ndarray,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(id, cosine) for every row — exact, built-ins only."""
    probe = np.asarray(probe, dtype=np.float64)
    pnorm = float(np.linalg.norm(probe))
    parr = F.array(*[F.lit(float(x)) for x in probe])
    vec = F.col(vec_col)
    dot = _dot(vec, parr)
    norm = F.sqrt(_dot(vec, vec))
    return df.select(F.col(id_col),
                     (dot / (norm * F.lit(pnorm))).alias("cosine"))


def cosine_topk(df: DataFrame, probe: np.ndarray, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: one scan + a global top-k (Spark turns
    orderBy().limit(k) into per-partition TakeOrdered — no full sort)."""
    return (cosine_scores(df, probe, id_col, vec_col)
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def _hyperplanes(dim: int, nbits: int, seed: int = 1234) -> np.ndarray:
    """Deterministic random hyperplanes: counter-based normals via
    SplitMix64 -> uniform -> Box-Muller (no sequential RNG state)."""
    n = dim * nbits
    keys = np.arange(2 * n, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B9)
    u = (splitmix64(keys).astype(np.float64) + 0.5) / 2.0**64
    u1, u2 = u[:n], u[n:]
    z = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return z.reshape(nbits, dim)


def lsh_signatures(df: DataFrame, dim: int, nbits: int = 16,
                   seed: int = 1234, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, bucket): sign-of-projection signature per vector; one
    vectorized matrix multiply per Arrow batch."""
    planes = _hyperplanes(dim, nbits, seed)

    def sig(iterator):
        bit_w = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))
        for pdf in iterator:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = mat @ planes.T            # (N, nbits)
            buckets = ((proj > 0).astype(np.uint64) * bit_w).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "bucket": buckets.astype(np.int64)})

    return df.select(id_col, vec_col).mapInPandas(
        sig, schema=f"{id_col} long, bucket long")


def ann_lsh_topk(df: DataFrame, probe: np.ndarray, k: int = 10,
                 nbits: int = 16, multiprobe: int = 1, n_tables: int = 4,
                 seed: int = 1234, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: union the probe's bucket (plus buckets within
    ``multiprobe`` flipped bits) across ``n_tables`` independent hash
    tables, re-rank candidates with exact cosine. Multi-table union is the
    standard recall lever (recall ~ 1-(1-p^nbits)^n_tables); multiprobe
    trades extra buckets for fewer tables. Tested against the brute-force
    baseline on planted near-duplicates — on *near-random* vectors (no true
    near neighbours) every bucketed ANN degrades toward scanning, which is
    the honest trade-off."""
    from itertools import combinations

    probe = np.asarray(probe, dtype=np.float64)
    bit_w = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))
    cand_ids = None
    for t in range(n_tables):
        t_seed = seed + 7919 * t
        planes = _hyperplanes(len(probe), nbits, t_seed)
        base_bits = (probe @ planes.T) > 0
        base = int((base_bits.astype(np.uint64) * bit_w).sum())
        buckets = {base}
        for r in range(1, multiprobe + 1):
            for flips in combinations(range(nbits), r):
                b = base
                for f in flips:
                    b ^= 1 << f
                buckets.add(b)
        sigs = lsh_signatures(df, len(probe), nbits, t_seed, id_col, vec_col)
        ids_t = sigs.where(F.col("bucket").isin(sorted(buckets))) \
            .select(id_col)
        cand_ids = ids_t if cand_ids is None else cand_ids.unionByName(ids_t)
    cands = df.join(cand_ids.dropDuplicates([id_col]), id_col, "left_semi")
    return cosine_topk(cands, probe, k, id_col, vec_col)


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                          nbits: int = 12, n_tables: int = 2,
                          seed: int = 1234, id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket equi-join for candidates
    (union over ``n_tables`` independent tables — recall 1-(1-p^nbits)^L),
    exact cosine verify — precision 1.0, probabilistic recall."""
    # infer dim from one row (schema-level arrays carry no length)
    first = df.select(vec_col).head(1)
    if not first:
        return df.sparkSession.createDataFrame(
            [], schema="id_a long, id_b long, cosine double")
    dim = len(first[0][0])
    pairs = None
    for t in range(n_tables):
        sigs = lsh_signatures(df, dim, nbits, seed + 7919 * t,
                              id_col, vec_col)
        with_sig = df.join(sigs, id_col)
        a = with_sig.alias("a")
        b = with_sig.alias("b")
        p_t = (a.join(b, "bucket")
               .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
               .select(F.col(f"a.{id_col}").alias("id_a"),
                       F.col(f"a.{vec_col}").alias("va"),
                       F.col(f"b.{id_col}").alias("id_b"),
                       F.col(f"b.{vec_col}").alias("vb")))
        pairs = p_t if pairs is None else pairs.unionByName(p_t)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    cos = (_dot(F.col("va"), F.col("vb"))
           / (F.sqrt(_dot(F.col("va"), F.col("va")))
              * F.sqrt(_dot(F.col("vb"), F.col("vb")))))
    return (pairs.withColumn("cosine", cos)
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
            .dropDuplicates(["id_a", "id_b"]))
