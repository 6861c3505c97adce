"""Word-aligned RLE (EWAH-style) compressed bitmaps — SURVEY §2.4 F8.

Re-expresses the role of the reference's EWAH dependency
(`EWAHBloomFilter.java:31-44`: "good choice for large filters with
relatively low k"; vendored word-run ops `EWAHCompressedBitmap.java`
or/and/xor and `FastAggregation.java:287,313` multi-way OR) as a
from-scratch NumPy run-length scheme — NOT a port of JavaEWAH. The model
is the published word-aligned-hybrid idea (Lemire, Kaser & Aouiche 2010,
"Sorting improves word-aligned bitmap indexes" — public knowledge): a
bitmap is a sequence of *uniform word runs* (all-zero / all-one, stored
as one (bit, count) pair) and *literal word arrays* (stored verbatim).
Logical ops stream the two segment sequences pairwise: run x run spans
combine in O(1) without decompression; spans touching a literal combine
with one vectorized NumPy word op and are re-run-length-encoded on the
fly.

Engine role: the in-flight slabs stay DENSE by design (SIMD word-ANDs,
SURVEY §2.4 F8 note) and Parquet+zstd compresses at rest; this module
provides the compressed *operator* surface itself — or/and/xor,
FastAggregation-style multi-way OR, cardinality — for workloads with
long uniform runs (sparse gates, low-k filters), tested bit-exact
against the dense kernels.
"""

from __future__ import annotations

import numpy as np

from mdbloom import bits as B

FULL = np.uint64(0xFFFFFFFFFFFFFFFF)


class EwahBitmap:
    """Immutable compressed bitmap over ``n_words`` 64-bit words.

    ``segments`` is a canonical list of
      ("r", bit, count)   — ``count`` uniform words of all-``bit``;
      ("l", words)        — a literal ``np.uint64`` array;
    adjacent same-bit runs merged, no empty segments, total = n_words.
    """

    __slots__ = ("n_words", "segments")

    def __init__(self, n_words: int, segments: list):
        self.n_words = n_words
        self.segments = segments

    # ---------------- construction ----------------

    @staticmethod
    def from_dense(words: np.ndarray) -> "EwahBitmap":
        words = np.ascontiguousarray(words, dtype=B.U64)
        return EwahBitmap(len(words), _encode(words))

    @staticmethod
    def from_filter(packed: np.ndarray) -> "EwahBitmap":
        """From a packed little-endian uint64 filter (mdbloom.bits)."""
        return EwahBitmap.from_dense(packed)

    @staticmethod
    def zeros(n_words: int) -> "EwahBitmap":
        return EwahBitmap(n_words, [("r", 0, n_words)] if n_words else [])

    # ---------------- wire format ----------------
    #
    # Word-aligned little-endian uint64 stream so compressed bitmaps can
    # ride a Spark shuffle / Arrow batch as ``binary`` columns (the role
    # of JavaEWAH's `serialize`/`deserialize`, re-designed not copied):
    #   word 0        : n_words (uncompressed logical length)
    #   per segment   : one marker word, then payload
    #     run     marker = count << 2 | bit << 1 | 0   (no payload)
    #     literal marker = length << 2 | 1, then `length` verbatim words
    # Compressed size stays within one word of `compressed_words` per
    # segment, so the shuffle ships runs in O(1) bytes.

    def to_bytes(self) -> bytes:
        words = [np.uint64(self.n_words)]
        for seg in self.segments:
            if seg[0] == "r":
                words.append(np.uint64((seg[2] << 2) | (seg[1] << 1)))
            else:
                words.append(np.uint64((len(seg[1]) << 2) | 1))
                words.append(seg[1])
        parts = [w if isinstance(w, np.ndarray) else np.array([w], dtype=B.U64)
                 for w in words]
        return np.concatenate(parts).astype("<u8").tobytes()

    @staticmethod
    def from_bytes(buf: bytes) -> "EwahBitmap":
        words = np.frombuffer(buf, dtype="<u8").astype(B.U64)
        n_words = int(words[0])
        segs: list = []
        i = 1
        total = 0
        while total < n_words:
            if i >= len(words):
                raise ValueError("corrupt EWAH byte stream")
            marker = int(words[i])
            i += 1
            count = marker >> 2
            if marker & 1:
                if i + count > len(words):
                    raise ValueError("corrupt EWAH byte stream")
                segs.append(("l", words[i:i + count].copy()))
                i += count
            else:
                segs.append(("r", (marker >> 1) & 1, count))
            total += count
        if total != n_words or i != len(words):
            raise ValueError("corrupt EWAH byte stream")
        return EwahBitmap(n_words, segs)

    def to_dense(self) -> np.ndarray:
        out = np.empty(self.n_words, dtype=B.U64)
        i = 0
        for seg in self.segments:
            if seg[0] == "r":
                out[i:i + seg[2]] = FULL if seg[1] else np.uint64(0)
                i += seg[2]
            else:
                out[i:i + len(seg[1])] = seg[1]
                i += len(seg[1])
        return out

    # ---------------- metrics ----------------

    def cardinality(self) -> int:
        """Set-bit count without decompression (per-segment popcount)."""
        n = 0
        for seg in self.segments:
            if seg[0] == "r":
                n += 64 * seg[2] if seg[1] else 0
            else:
                n += int(B.popcount64(seg[1]).sum())
        return n

    @property
    def compressed_words(self) -> int:
        """Stored word count (1 marker per run + literal lengths) — the
        compression metric the tests bound."""
        return sum(1 if s[0] == "r" else len(s[1]) for s in self.segments)

    # ---------------- logical ops (streaming, no full decompression) ----

    def __or__(self, other: "EwahBitmap") -> "EwahBitmap":
        return _binop(self, other, np.bitwise_or, lambda a, b: a | b)

    def __and__(self, other: "EwahBitmap") -> "EwahBitmap":
        return _binop(self, other, np.bitwise_and, lambda a, b: a & b)

    def __xor__(self, other: "EwahBitmap") -> "EwahBitmap":
        return _binop(self, other, np.bitwise_xor, lambda a, b: a ^ b)

    @staticmethod
    def or_many(bitmaps: list["EwahBitmap"]) -> "EwahBitmap":
        """Multi-way OR, log-depth pairwise tree — the FastAggregation
        analogue (`FastAggregation.java:287-311`)."""
        if not bitmaps:
            raise ValueError("or_many of nothing")
        layer = list(bitmaps)
        while len(layer) > 1:
            nxt = [layer[i] | layer[i + 1] if i + 1 < len(layer)
                   else layer[i] for i in range(0, len(layer), 2)]
            layer = nxt
        return layer[0]

    def __eq__(self, other) -> bool:
        return (isinstance(other, EwahBitmap)
                and self.n_words == other.n_words
                and bool(np.array_equal(self.to_dense(), other.to_dense())))

    def __hash__(self) -> int:
        # defining __eq__ alone would set __hash__ = None (unhashable);
        # bitmaps are value objects (every op returns a new instance), so
        # hash over the dense content
        return hash((self.n_words, self.to_dense().tobytes()))


# ---------------- internals ----------------

def _encode(words: np.ndarray) -> list:
    """Dense words -> canonical segment list (vectorized run detection)."""
    n = len(words)
    if n == 0:
        return []
    # classify each word: 0 = zero-run, 1 = one-run, 2 = literal
    cls = np.full(n, 2, dtype=np.int8)
    cls[words == 0] = 0
    cls[words == FULL] = 1
    bounds = np.flatnonzero(np.diff(cls)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))
    segs: list = []
    for s, e in zip(starts, ends):
        c = int(cls[s])
        if c == 2:
            segs.append(("l", words[s:e].copy()))
        else:
            segs.append(("r", c, int(e - s)))
    return segs


def _emit(segs: list, seg) -> None:
    """Append a segment, merging with the tail to keep canonical form."""
    if seg[0] == "r":
        if seg[2] == 0:
            return
        if segs and segs[-1][0] == "r" and segs[-1][1] == seg[1]:
            segs[-1] = ("r", seg[1], segs[-1][2] + seg[2])
            return
        segs.append(seg)
    else:
        if len(seg[1]) == 0:
            return
        # re-run-length-encode literal output (op results may be uniform)
        for sub in _encode(seg[1]):
            if sub[0] == "r":
                _emit(segs, sub)
            elif segs and segs[-1][0] == "l":
                segs[-1] = ("l", np.concatenate((segs[-1][1], sub[1])))
            else:
                segs.append(sub)


def _spans(bm: EwahBitmap):
    """Flatten to (is_run, bit_or_words, count) triples."""
    for seg in bm.segments:
        if seg[0] == "r":
            yield (True, seg[1], seg[2])
        else:
            yield (False, seg[1], len(seg[1]))


def _binop(a: EwahBitmap, b: EwahBitmap, word_op, run_op) -> EwahBitmap:
    if a.n_words != b.n_words:
        raise ValueError(f"length mismatch: {a.n_words} vs {b.n_words}")
    ita, itb = _spans(a), _spans(b)
    ca = cb = None   # current (is_run, payload, remaining, offset)
    out: list = []
    done = 0
    while done < a.n_words:
        if ca is None:
            ca = list(next(ita)) + [0]
        if cb is None:
            cb = list(next(itb)) + [0]
        span = min(ca[2], cb[2])
        if ca[0] and cb[0]:
            # run x run: O(1), no decompression
            _emit(out, ("r", int(run_op(ca[1], cb[1])), span))
        else:
            wa = (np.full(span, FULL if ca[1] else 0, dtype=B.U64)
                  if ca[0] else ca[1][ca[3]:ca[3] + span])
            wb = (np.full(span, FULL if cb[1] else 0, dtype=B.U64)
                  if cb[0] else cb[1][cb[3]:cb[3] + span])
            _emit(out, ("l", word_op(wa, wb)))
        for cur in (ca, cb):
            cur[2] -= span
            cur[3] += span
        if ca[2] == 0:
            ca = None
        if cb[2] == 0:
            cb = None
        done += span
    return EwahBitmap(a.n_words, out)
