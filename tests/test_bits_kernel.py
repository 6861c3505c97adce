"""Unit tests for the packed-bitset primitives and the bit-sliced slab
kernel (functional parity with reference EWAHBloomFilter / FlatBloofi
operations — see mdbloom/bits.py and mdbloom/kernel.py docstrings)."""

import numpy as np
import pytest

from mdbloom import bits as B
from mdbloom import kernel as K
from mdbloom.hashing import (
    TokenMaskCache,
    hash_unique_tokens,
    km_bit_positions,
    km_positions_matrix,
    token_hash_pair,
)
from mdbloom.shape import Shape

RNG = np.random.default_rng(42)


def rand_filters(n, m, density=0.1, rng=RNG):
    bits = (rng.random((n, m)) < density).astype(np.uint8)
    return B.pack_bits_matrix(bits), bits


# ---------- bits ----------

def test_set_and_unpack_roundtrip():
    m = 94
    f = B.from_bits(np.array([0, 63, 64, 93]), m)
    bits = B.unpack(f, m)
    assert sorted(np.flatnonzero(bits)) == [0, 63, 64, 93]
    assert B.cardinality(f) == 4


def test_pack_unpack_matrix_roundtrip():
    packed, bits = rand_filters(37, 130)
    assert np.array_equal(B.unpack(packed, 130), bits)
    assert np.array_equal(B.pack_bits_matrix(bits), packed)


def test_contains_and_equals():
    m = 58
    a = B.from_bits(np.array([29, 13]), m)
    sub = B.from_bits(np.array([29]), m)
    other = B.from_bits(np.array([30]), m)
    assert B.contains(a, sub) and B.contains(a, a)
    assert not B.contains(sub, a)
    assert not B.contains(a, other)
    assert B.equals(a, a) and not B.equals(a, sub)


def test_contains_words_matches_dense_contains():
    rng = np.random.default_rng(7)
    m = 4096
    stored = np.stack([B.from_bits(
        np.unique(rng.integers(0, m, 60)), m) for _ in range(32)])
    for nbits in (0, 1, 5, 40):
        q = B.from_bits(np.unique(rng.integers(0, m, nbits)), m) \
            if nbits else B.from_bits(np.empty(0, dtype=np.int64), m)
        dense = B.contains(stored, q)
        sparse = B.contains_words(stored, *B.nonzero_words(q))
        assert np.array_equal(dense, sparse)
        one = stored[0]
        assert B.contains(one, q) == B.contains_words(
            one, *B.nonzero_words(q))


def test_merge_or_is_associative_commutative_idempotent():
    packed, _ = rand_filters(3, 200)
    a, b, c = packed
    ab_c = B.merge_or(B.merge_or(a, b), c)
    a_bc = B.merge_or(a, B.merge_or(b, c))
    assert np.array_equal(ab_c, a_bc)
    assert np.array_equal(B.merge_or(a, b), B.merge_or(b, a))
    assert np.array_equal(B.merge_or(a, a), a)


def test_popcount_matches_numpy():
    x = RNG.integers(0, 2**63, size=1000, dtype=np.uint64)
    expect = np.array([bin(int(v)).count("1") for v in x])
    assert np.array_equal(B.popcount64(x), expect)


def test_cardinalities():
    m = 100
    a = B.from_bits(np.array([1, 2, 3]), m)
    b = B.from_bits(np.array([3, 4]), m)
    assert B.and_cardinality(a, b) == 1
    assert B.or_cardinality(a, b) == 4
    assert B.xor_cardinality(a, b) == 3


def test_serialization_canonical():
    m = 94
    f = B.from_bits(np.array([0, 64, 93]), m)
    raw = B.to_bytes(f)
    assert len(raw) == 16
    assert np.array_equal(B.from_bytes(raw, m), f)
    # bit 0 -> lowest bit of first byte (frozen little-endian layout)
    assert raw[0] & 1 == 1


def test_content_key_deterministic_and_distinct():
    m = 58
    a = B.from_bits(np.array([29, 13]), m)
    b = B.from_bits(np.array([29]), m)
    assert B.content_key(a) == B.content_key(a.copy())
    assert B.content_key(a) != B.content_key(b)
    packed = np.stack([a, b])
    assert B.content_keys(packed) == [B.content_key(a), B.content_key(b)]


# ---------- hashing ----------

def test_token_hash_pair_deterministic():
    assert token_hash_pair("hello") == token_hash_pair(b"hello")
    assert token_hash_pair("hello") != token_hash_pair("world")


def test_km_positions_matrix_matches_scalar():
    s = Shape.from_np(3, 1e-4)
    toks = [f"tok{i}" for i in range(50)]
    h1s, h2s = hash_unique_tokens(toks)
    mat = km_positions_matrix(h1s, h2s, s)
    for j, t in enumerate(toks):
        h1, h2 = token_hash_pair(t)
        assert np.array_equal(mat[j], km_bit_positions(h1, h2, s))
    assert mat.min() >= 0 and mat.max() < s.m


def test_no_coset_trap_small_even_m():
    """Regression: plain K-M with mod-2^64 wraparound over even m traps all
    k positions in a parity coset ('Hello'/'World' shared 20/22 bits at
    m=94). Enhanced double hashing must keep cross-token overlap near the
    random expectation k^2/m."""
    s = Shape.from_np(3, 1 / 3_000_000)  # m=94, k=22
    toks = [f"w{i:04d}" for i in range(200)]
    h1s, h2s = hash_unique_tokens(toks)
    pos = km_positions_matrix(h1s, h2s, s)
    sets = [set(row.tolist()) for row in pos]
    # every token should reach both parities
    parities = [len({p % 2 for p in st}) for st in sets]
    assert np.mean(parities) > 1.9
    overlaps = [len(sets[i] & sets[j])
                for i in range(0, 100) for j in range(100, 200)]
    expect = (s.k ** 2) / s.m  # ~5.1
    assert np.mean(overlaps) < 2 * expect
    assert max(overlaps) < s.k  # no token's bits contain another's entirely


def test_token_mask_cache_or_semantics():
    s = Shape.from_np(3, 1e-4)
    cache = TokenMaskCache(s)
    f_ab = cache.filter_for(["a", "b"])
    f_a = cache.filter_for(["a"])
    f_b = cache.filter_for(["b"])
    assert np.array_equal(f_ab, B.merge_or(f_a, f_b))
    assert B.contains(f_ab, f_a)
    assert np.array_equal(cache.filter_for([]), B.zeros(s.m))


# ---------- kernel / slab ----------

def test_slab_roundtrip():
    m = 94
    packed, _ = rand_filters(200, m)
    slab = K.build_slab(packed, m)
    assert slab.shape == (m, (200 + 63) // 64)
    back = K.slab_to_filters(slab, 200)
    assert np.array_equal(back, packed)


def test_query_slab_matches_linear_scan():
    m = 128
    packed, _ = rand_filters(500, m, density=0.2)
    slab = K.build_slab(packed, m)
    q = packed[17] & packed[18]  # a subset-ish query
    qbits = np.flatnonzero(B.unpack(q, m))
    slab_hits = K.query_slab(slab, qbits, 500)
    lin_hits = K.linear_search(packed, q)
    assert np.array_equal(slab_hits, lin_hits)
    assert 17 in slab_hits or qbits.size == 0


def test_query_slab_empty_query_matches_all():
    m = 64
    packed, _ = rand_filters(10, m)
    slab = K.build_slab(packed, m)
    assert np.array_equal(K.query_slab(slab, np.array([], dtype=np.int64), 10),
                          np.arange(10))


def test_query_slab_batch_matches_looped_query_slab():
    m = 128
    rng = np.random.default_rng(7)
    packed, _ = rand_filters(500, m, density=0.2)
    slab = K.build_slab(packed, m)
    queries = []
    for q in range(40):
        k = int(rng.integers(1, 9))
        queries.append(np.sort(rng.choice(m, size=k, replace=False))
                       .astype(np.int64))
    # a guaranteed-hit query and a near-impossible one
    queries.append(np.flatnonzero(B.unpack(packed[3], m)).astype(np.int64))
    queries.append(np.arange(m, dtype=np.int64))
    offs, concat = [], []
    for qb in queries:
        offs.append(len(concat))
        concat.extend(qb.tolist())
    q_idx, slots = K.query_slab_batch(
        slab, np.asarray(concat, dtype=np.int64),
        np.asarray(offs, dtype=np.int64), 500)
    got = {}
    for qi, sl in zip(q_idx, slots):
        got.setdefault(int(qi), []).append(int(sl))
    for i, qb in enumerate(queries):
        expect = K.query_slab(slab, qb, 500).tolist()
        assert got.get(i, []) == expect, f"query {i} mismatch"


def test_query_slab_batch_empty_inputs():
    m = 64
    packed, _ = rand_filters(10, m)
    slab = K.build_slab(packed, m)
    q_idx, slots = K.query_slab_batch(
        slab, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), 10)
    assert q_idx.size == 0 and slots.size == 0
    q_idx, slots = K.query_slab_batch(
        slab, np.array([0], dtype=np.int64), np.array([0], dtype=np.int64), 0)
    assert q_idx.size == 0 and slots.size == 0


def test_query_slab_exact():
    m = 58
    f1 = B.from_bits(np.array([29, 13]), m)
    f2 = B.from_bits(np.array([29, 13, 14]), m)
    f3 = B.from_bits(np.array([29]), m)
    packed = np.stack([f1, f2, f3])
    slab = K.build_slab(packed, m)
    # containment finds f1 and f2; exact finds only f1
    assert list(K.query_slab(slab, np.array([29, 13]), 3)) == [0, 1]
    assert list(K.query_slab_exact(slab, f1, m, 3)) == [0]
    assert list(K.query_slab_exact(slab, f3, m, 3)) == [2]


def test_summary_and_gate():
    m = 58
    f1 = B.from_bits(np.array([29, 13]), m)
    f2 = B.from_bits(np.array([30, 13]), m)
    packed = np.stack([f1, f2])
    summ = K.summary_filter(packed, m)
    assert B.contains(summ, f1) and B.contains(summ, f2)
    counts = K.gate_counts(packed, m)
    assert counts[13] == 2 and counts[29] == 1 and counts[30] == 1
    assert K.gate_contains(counts, np.array([13, 29]))
    assert not K.gate_contains(counts, np.array([13, 40]))
    # deletion by subtraction keeps the gate consistent
    counts2 = counts - K.gate_counts(packed[:1], m)
    assert not K.gate_contains(counts2, np.array([29]))
    assert K.gate_contains(counts2, np.array([13, 30]))


def test_fpr_within_predicted_bound():
    """Observed FPR within Wilson 99% CI of the Shape-predicted p
    (BASELINE.md target)."""
    shape = Shape.from_np(1000, 0.01)
    cache = TokenMaskCache(shape)
    present = [f"in{i}" for i in range(1000)]
    filt = cache.filter_for(present)
    probes = 100_000
    names = np.array([f"out{i}" for i in range(probes)], dtype=object)
    masks = cache.masks_for(names)
    hits = B.contains(np.broadcast_to(filt, masks.shape) & masks, masks).sum()
    # hits where (filt & mask) == mask  <=> all probe bits present
    observed = ((masks & filt) == masks).all(axis=1).mean()
    p = shape.predicted_fpr(1000)
    z = 2.576
    half = z * np.sqrt(p * (1 - p) / probes)
    assert observed == pytest.approx(p, abs=max(3 * half, 0.004)), \
        f"observed {observed} vs predicted {p}"
