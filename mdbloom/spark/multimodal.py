"""Multimodal column plumbing: opaque ``binary`` media + typed metadata.

The Spark-side engineering here is REAL and tested — schema, partitioning,
Arrow batch shapes, UDF signatures, frame-sampling arithmetic. The actual
codec work is STUBBED: this container ships no image/audio libraries, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless a
decoder is injected, and the tested path uses :func:`fake_decoder` — a
deterministic stand-in that fabricates (height, width, channels) from the
payload bytes. Swap in a real decoder (PIL / soundfile) by passing
``decoder=`` where available.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "mime string, n_bytes int")
FEATURE_SCHEMA = ("media_id long, kind string, height int, width int, "
                  "channels int, n_frames int, feature array<float>")


def fake_decoder(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in decoder: derives plausible media properties
    from a hash of the payload. NOT a real codec — clearly marked.

    Hashes the lowercase-hex form of the payload (not the raw bytes) so
    an ANSI-SQL oracle can recompute every property bit-for-bit:
    DuckDB's md5() is VARCHAR-only, and ``md5(lower(hex(payload)))``
    there equals ``md5(payload.hex())`` here."""
    h = hashlib.md5(payload.hex().encode()).digest()
    return {
        "height": 16 + h[0] % 64,
        "width": 16 + h[1] % 64,
        "channels": 1 + h[2] % 3,
        "n_frames": 1 if kind == "image" else 1 + h[3] % 120,
    }


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode is unavailable in this environment."""
    raise NotImplementedError(
        "no image codec in this container; pass decoder=fake_decoder or a "
        "real decoder (e.g. PIL.Image.open) to extract_features()")


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic opaque media table for plumbing tests: payload bytes
    are counter-derived, kind alternates image/audio/video."""
    kinds = ["image", "audio", "video"]

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                payload = hashlib.sha256(
                    f"{seed}:{i}".encode()).digest() * (4 + int(i) % 4)
                kind = kinds[int(i) % 3]
                rows.append((int(i), kind, payload,
                             f"application/x-fake-{kind}", len(payload)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                              "mime", "n_bytes"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _byte_quantiles(concat_u8: np.ndarray, lens: np.ndarray,
                    q_grid: np.ndarray) -> np.ndarray:
    """(N, Q) quantiles of N concatenated uint8 segments, fully
    vectorized: one bincount builds per-segment 256-bin histograms, the
    CDF locates the two order statistics each quantile interpolates
    between, and numpy's 'linear' lerp formula is mirrored term-for-term
    — bit-equal to per-payload ``np.quantile(a, q_grid)`` (tested) with
    zero Python-level iteration. Byte values are discrete, so the k-th
    order statistic is just the first histogram bin whose CDF exceeds k.
    Empty segments yield NaN rows (np.quantile of [] is an error)."""
    n = len(lens)
    out = np.full((n, len(q_grid)), np.nan)
    safe = lens > 0
    if not safe.any():
        return out
    seg = np.repeat(np.arange(n, dtype=np.int64), lens)
    hist = np.bincount(seg * 256 + concat_u8.astype(np.int64),
                       minlength=n * 256).reshape(n, 256)
    cdf = hist.cumsum(axis=1)                              # (N, 256)
    pos = q_grid[None, :] * (lens[:, None] - 1)            # (N, Q)
    lo = np.floor(pos).astype(np.int64)
    hi = np.ceil(pos).astype(np.int64)
    # value of sorted-order statistic k = first bin v with cdf[v] > k,
    # i.e. searchsorted(cdf_row, k, 'right'). Batched over rows with the
    # offset-flattening trick: add r*BIG to row r (BIG > any count) so
    # the concatenated CDFs stay globally nondecreasing and ONE
    # searchsorted answers all (row, quantile) probes.
    big = int(lens.max()) + 1
    offs = np.arange(n, dtype=np.int64) * big              # (N,)
    flat = (cdf + offs[:, None]).ravel()
    def stat(k):
        g = np.searchsorted(flat, (k + offs[:, None]).ravel(),
                            side="right").reshape(n, len(q_grid))
        return (g - np.arange(n, dtype=np.int64)[:, None] * 256)\
            .astype(np.float64)
    a, b = stat(lo), stat(hi)
    t = pos - lo
    diff = b - a
    # numpy _lerp: a + diff*t, switching to b - diff*(1-t) when t >= 0.5
    res = a + diff * t
    np.copyto(res, b - diff * (1 - t), where=t >= 0.5)
    out[safe] = res[safe]
    return out


def extract_features(df: DataFrame, decoder: Callable | None = None,
                     feat_dim: int = 8,
                     sample_every: int = 10) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas`` Arrow batches.

    ``decoder(payload, kind) -> {height, width, channels, n_frames}``;
    features are a deterministic byte-statistics vector (mean/std/quantiles
    of the payload — a placeholder embedding with the real batch plumbing).
    ``sample_every`` drives the frame-sampling arithmetic for video.

    Only the DECODE call is per-row (a codec is inherently per-payload);
    mean/std run as segment-reduceat and quantiles as one histogram
    bincount (:func:`_byte_quantiles`) over ONE concatenated array —
    O(total payload bytes) memory and zero Python-level loops in the
    stats. (The earlier padded (N, max_len) matrix was O(N * max_len):
    one 50 MB video in a batch of small images allocated orders of
    magnitude more than the data; the earlier per-payload np.quantile
    loop dominated many-small-payload batches.)"""
    dec = decoder or (lambda p, k: decode_image(p))
    q_grid = np.linspace(0, 1, feat_dim - 2)

    def run(iterator):
        for pdf in iterator:
            if not len(pdf):
                continue
            payloads = [np.frombuffer(bytes(p), dtype=np.uint8)
                        for p in pdf["payload"]]
            metas = [dec(bytes(p), k)
                     for p, k in zip(pdf["payload"], pdf["kind"])]
            lens = np.array([len(a) for a in payloads], dtype=np.int64)
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            concat_u8 = (np.concatenate(payloads) if lens.sum()
                         else np.zeros(0, dtype=np.uint8))
            concat = (concat_u8.astype(np.float64)
                      if concat_u8.size else np.zeros(1))
            safe = lens > 0  # reduceat on an empty segment is undefined
            denom = np.where(safe, lens, 1).astype(np.float64)
            sums = np.add.reduceat(concat, np.minimum(
                starts, len(concat) - 1))
            sumsq = np.add.reduceat(concat * concat, np.minimum(
                starts, len(concat) - 1))
            means = np.where(safe, sums / denom, np.nan)
            var = np.maximum(sumsq / denom - (sums / denom) ** 2, 0.0)
            stds = np.where(safe, np.sqrt(var), np.nan)
            qs = _byte_quantiles(concat_u8, lens, q_grid)  # (N, feat_dim-2)
            feats = np.column_stack([means, stds, qs]).astype(np.float32)
            n_frames = np.array([m["n_frames"] for m in metas],
                                dtype=np.int64)
            is_video = (pdf["kind"] == "video").to_numpy()
            sampled = np.where(is_video,
                               np.maximum(1, n_frames // sample_every),
                               n_frames)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "height": [m["height"] for m in metas],
                "width": [m["width"] for m in metas],
                "channels": [m["channels"] for m in metas],
                "n_frames": sampled,
                "feature": list(feats),
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
