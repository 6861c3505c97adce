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
    from a hash of the payload. NOT a real codec — clearly marked."""
    h = hashlib.md5(payload).digest()
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


def extract_features(df: DataFrame, decoder: Callable | None = None,
                     feat_dim: int = 8,
                     sample_every: int = 10) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas`` Arrow batches.

    ``decoder(payload, kind) -> {height, width, channels, n_frames}``;
    features are a deterministic byte-statistics vector (mean/std/quantiles
    of the payload — a placeholder embedding with the real batch plumbing).
    ``sample_every`` drives the frame-sampling arithmetic for video."""
    dec = decoder or (lambda p, k: decode_image(p))

    def run(iterator):
        for pdf in iterator:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                meta = dec(bytes(r.payload), r.kind)
                arr = np.frombuffer(bytes(r.payload), dtype=np.uint8) \
                    .astype(np.float32)
                qs = np.quantile(arr, np.linspace(0, 1, feat_dim - 2))
                feat = np.concatenate([[arr.mean(), arr.std()], qs]) \
                    .astype(np.float32)
                n_frames = meta["n_frames"]
                sampled = max(1, n_frames // sample_every) \
                    if r.kind == "video" else n_frames
                rows.append((r.media_id, r.kind, meta["height"],
                             meta["width"], meta["channels"], sampled,
                             feat.tolist()))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "height", "width", "channels",
                "n_frames", "feature"])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
