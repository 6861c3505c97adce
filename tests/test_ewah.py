"""EWAH-style word-aligned RLE bitmaps (SURVEY §2.4 F8): bit-exact parity
with dense NumPy ops, compression on uniform runs, multi-way OR tree."""

import numpy as np
import pytest

from mdbloom import bits as B
from mdbloom.ewah import FULL, EwahBitmap


def _random_words(rng, n, density):
    """Mixed structure: uniform runs interleaved with literal noise."""
    out = np.zeros(n, dtype=B.U64)
    i = 0
    while i < n:
        kind = rng.random()
        run = int(rng.integers(1, max(2, n // 4)))
        run = min(run, n - i)
        if kind < 0.35:
            pass                       # zero run
        elif kind < 0.5:
            out[i:i + run] = FULL      # one run
        else:
            bits = rng.random((run, 64)) < density
            out[i:i + run] = B.pack_bits_matrix(
                bits.astype(np.uint8).reshape(run, 64)).ravel()
        i += run
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n_words", [1, 7, 64, 300])
def test_roundtrip_and_cardinality(seed, n_words):
    rng = np.random.default_rng(seed)
    w = _random_words(rng, n_words, 0.3)
    bm = EwahBitmap.from_dense(w)
    assert np.array_equal(bm.to_dense(), w)
    assert bm.cardinality() == int(B.popcount64(w).sum())


@pytest.mark.parametrize("seed", range(6))
def test_binary_ops_match_dense(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 200))
    wa, wb = _random_words(rng, n, 0.4), _random_words(rng, n, 0.2)
    a, b = EwahBitmap.from_dense(wa), EwahBitmap.from_dense(wb)
    assert np.array_equal((a | b).to_dense(), wa | wb)
    assert np.array_equal((a & b).to_dense(), wa & wb)
    assert np.array_equal((a ^ b).to_dense(), wa ^ wb)


def test_compression_on_uniform_runs():
    n = 4096
    zeros = EwahBitmap.zeros(n)
    assert zeros.compressed_words == 1
    w = np.zeros(n, dtype=B.U64)
    w[2048:2050] = FULL                      # tiny literal island
    bm = EwahBitmap.from_dense(w)
    assert bm.compressed_words <= 3          # run0 + run1 + run0 markers
    # dense-random data stays ~uncompressed (honest upper bound)
    rng = np.random.default_rng(0)
    dense = rng.integers(1, 1 << 62, n, dtype=np.uint64) | np.uint64(2)
    assert EwahBitmap.from_dense(dense).compressed_words == n


def test_or_many_matches_dense_fold():
    """FastAggregation-analogue multi-way OR == dense reduce."""
    rng = np.random.default_rng(7)
    n = 150
    ws = [_random_words(rng, n, 0.1) for _ in range(9)]
    got = EwahBitmap.or_many([EwahBitmap.from_dense(w) for w in ws])
    assert np.array_equal(got.to_dense(),
                          np.bitwise_or.reduce(np.stack(ws), axis=0))


def test_sparse_bloom_filter_compresses():
    """A low-k filter over a large m (the reference's stated EWAH sweet
    spot, `EWAHBloomFilter.java:33-37`) compresses well."""
    from mdbloom.shape import Shape
    shape = Shape.from_mk(1 << 16, 4)        # 65536 bits = 1024 words
    filt = B.zeros(shape.m)
    B.set_bits(filt, np.asarray([5, 900, 33333, 65000], dtype=np.int64))
    bm = EwahBitmap.from_filter(filt)
    assert np.array_equal(bm.to_dense(), filt)
    assert bm.compressed_words <= 2 * 4 + 1  # <= one literal+run per bit


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_words", [0, 1, 7, 64, 300])
def test_bytes_roundtrip(seed, n_words):
    """Wire format: to_bytes/from_bytes is lossless for every segment
    mix, and runs ship in O(1) words (a shuffle-size guarantee)."""
    rng = np.random.default_rng(seed)
    words = _random_words(rng, n_words, 0.3)
    bm = EwahBitmap.from_dense(words)
    back = EwahBitmap.from_bytes(bm.to_bytes())
    assert back.n_words == n_words
    assert np.array_equal(back.to_dense(), words)
    # byte length = 1 header word + 1 marker per segment + literal words
    assert len(bm.to_bytes()) == 8 * (1 + len(bm.segments)
                                      + bm.compressed_words
                                      - sum(1 for s in bm.segments
                                            if s[0] == "r"))


def test_bytes_reject_corrupt():
    bm = EwahBitmap.from_dense(np.array([0, FULL, 5], dtype=B.U64))
    buf = bytearray(bm.to_bytes())
    buf[:8] = np.array([99], dtype="<u8").tobytes()   # lie about n_words
    with pytest.raises(ValueError):
        EwahBitmap.from_bytes(bytes(buf))
