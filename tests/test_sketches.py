"""Sketch accuracy vs exact oracles + merge-law suite (FIXTURES §4).

Every bound asserted here is the algorithm's published bound (scaled by the
3-sigma slack FIXTURES specifies), measured against exact computations on
seeded data.
"""

import numpy as np
import pytest

from mdbloom.shape import Shape
from mdbloom.sketches import (
    BloomSketch,
    CountingBloomSketch,
    CountMinSketch,
    HllSketch,
    KllSketch,
    TDigest,
)

RNG = np.random.default_rng(42)


# --------------------------------------------------------------- Bloom

@pytest.mark.parametrize("n,p", [(1000, 1e-2), (10_000, 1e-3), (10_000, 1e-4)])
def test_bloom_fpr_within_wilson_ci(n, p):
    shape = Shape.from_np(n, p)
    sk = BloomSketch(shape)
    present = np.array([f"in{i}" for i in range(n)], dtype=object)
    sk.update(present)
    assert sk.contains(present).all(), "no false negatives ever"
    probes = 100_000
    absent = np.array([f"out{i}" for i in range(probes)], dtype=object)
    observed = sk.contains(absent).mean()
    predicted = shape.predicted_fpr(n)
    half = 2.576 * np.sqrt(max(predicted * (1 - predicted), 1e-12) / probes)
    assert observed <= predicted + 3 * half + 1e-9, \
        f"FPR {observed} above predicted {predicted}"


def test_bloom_merge_byte_identical_any_order():
    shape = Shape.from_np(1000, 1e-3)
    chunks = [np.array([f"t{i}_{j}" for j in range(100)], dtype=object)
              for i in range(64)]
    def build(order):
        sk = BloomSketch(shape)
        for i in order:
            sk.merge(BloomSketch(shape).update(chunks[i]))
        return sk.to_bytes()
    seq = build(range(64))
    perm = build(RNG.permutation(64))
    assert seq == perm
    # tree merge
    parts = [BloomSketch(shape).update(c) for c in chunks]
    while len(parts) > 1:
        parts = [parts[i].merge(parts[i + 1]) if i + 1 < len(parts)
                 else parts[i] for i in range(0, len(parts), 2)]
    assert parts[0].to_bytes() == seq


def test_bloom_serde_roundtrip():
    shape = Shape.from_np(100, 1e-2)
    sk = BloomSketch(shape).update(np.array(["a", "b"], dtype=object))
    back = BloomSketch.from_bytes(sk.to_bytes())
    assert back.shape.m == shape.m
    assert back.contains(np.array(["a"], dtype=object)).all()
    assert sk.to_bytes() == back.to_bytes()


def test_counting_bloom_remove():
    shape = Shape.from_np(1000, 1e-3)
    sk = CountingBloomSketch(shape)
    vals = np.array([f"v{i}" for i in range(100)], dtype=object)
    sk.update(vals)
    assert sk.contains(vals).all()
    sk.remove(vals[:50])
    assert sk.contains(vals[50:]).all()
    assert not sk.contains(vals[:50]).all()
    assert (sk.counts >= 0).all()
    # sum merge
    a = CountingBloomSketch(shape).update(vals[:50])
    b = CountingBloomSketch(shape).update(vals[50:])
    merged = a.merge(b)
    full = CountingBloomSketch(shape).update(vals)
    assert merged.to_bytes() == full.to_bytes()


# --------------------------------------------------------------- HLL

@pytest.mark.parametrize("p", [12, 13, 14])
@pytest.mark.parametrize("true_d", [100, 10_000, 1_000_000])
def test_hll_error_bound(p, true_d):
    sk = HllSketch(p)
    # ints exercise the numeric hash path
    sk.update(np.arange(true_d, dtype=np.int64))
    est = sk.estimate()
    rse = 1.04 / np.sqrt(2 ** p)
    assert abs(est - true_d) / true_d <= 3 * rse, \
        f"p={p} d={true_d}: est {est}"


def test_hll_duplicates_dont_inflate():
    sk = HllSketch(12)
    vals = np.array([f"u{i % 500}" for i in range(50_000)], dtype=object)
    sk.update(vals)
    assert abs(sk.estimate() - 500) / 500 <= 3 * sk.rse


def test_hll_merge_byte_identical_and_equals_union():
    a = HllSketch(12).update(np.arange(0, 60_000))
    b = HllSketch(12).update(np.arange(40_000, 100_000))
    ab = HllSketch.from_bytes(a.to_bytes()).merge(b)
    ba = HllSketch.from_bytes(b.to_bytes()).merge(a)
    assert ab.to_bytes() == ba.to_bytes()
    union = HllSketch(12).update(np.arange(0, 100_000))
    assert ab.to_bytes() == union.to_bytes()  # max-merge == single pass


def test_hll_serde():
    sk = HllSketch(13).update(np.arange(1000))
    back = HllSketch.from_bytes(sk.to_bytes())
    assert back.estimate() == sk.estimate()


# --------------------------------------------------------------- CMS

def test_cms_error_bound_zipf():
    eps, delta = 1e-3, 1e-3
    sk = CountMinSketch(eps, delta)
    n = 200_000
    vals = RNG.zipf(1.3, size=n) % 5000
    sk.update(vals)
    uniq, true_counts = np.unique(vals, return_counts=True)
    est = sk.query(uniq)
    assert (est >= true_counts).all(), "CMS must never underestimate"
    viol = (est > true_counts + eps * n).mean()
    assert viol <= delta * 3, f"eps*N bound violated at rate {viol}"


def test_cms_merge_byte_identical():
    vals = RNG.integers(0, 1000, size=50_000)
    a = CountMinSketch(1e-3, 1e-3).update(vals[:25_000])
    b = CountMinSketch(1e-3, 1e-3).update(vals[25_000:])
    merged = CountMinSketch.from_bytes(a.to_bytes()).merge(b)
    single = CountMinSketch(1e-3, 1e-3).update(vals)
    assert merged.to_bytes() == single.to_bytes()
    rev = CountMinSketch.from_bytes(b.to_bytes()).merge(a)
    assert rev.to_bytes() == single.to_bytes()


def test_cms_weighted_update():
    sk = CountMinSketch(1e-2, 1e-2)
    sk.update(np.array(["x", "y"], dtype=object),
              weights=np.array([10, 5]))
    est = sk.query(np.array(["x", "y"], dtype=object))
    assert est[0] >= 10 and est[1] >= 5


# --------------------------------------------------------------- KLL

@pytest.mark.parametrize("dist", ["uniform", "lognormal", "turnidx"])
def test_kll_rank_error(dist):
    n = 100_000
    if dist == "uniform":
        data = RNG.uniform(0, 1000, n)
    elif dist == "lognormal":
        data = RNG.lognormal(3, 2, n)
    else:
        data = np.tile(np.arange(50), n // 50).astype(float)
    sk = KllSketch(k=200, seed=1).update(data)
    data_sorted = np.sort(data)
    bound = 3 * (0.7 / 200)  # normalized rank error bound (FIXTURES §4)
    # discrete data: rank is a step function — error can't resolve below
    # one atom's probability mass (1/50 for the turn_idx-like case)
    atom = 1.0 / 50 if dist == "turnidx" else 0.0
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        est = sk.quantile(q)
        true_rank = np.searchsorted(data_sorted, est, side="right") / n
        assert abs(true_rank - q) <= bound + atom + 1e-3, \
            f"{dist} q={q}: est rank {true_rank}"


def test_kll_merge_estimate_identical_under_permutation():
    data = RNG.normal(0, 1, 64_000)
    chunks = np.split(data, 64)
    def build(order):
        sk = KllSketch(k=200, seed=7)
        for i in order:
            sk.merge(KllSketch(k=200, seed=int(i)).update(chunks[i]))
        return sk
    a = build(list(range(64)))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    # permuted merge must stay within the sketch's own error bound of the
    # sequential merge (compaction coins differ by design)
    b_sk = build(list(RNG.permutation(64)))
    for q in qs:
        ra = np.mean(data <= a.quantile(q))
        rb = np.mean(data <= b_sk.quantile(q))
        assert abs(ra - rb) <= 2 * 3 * (0.7 / 200) + 1e-3


def test_kll_serde_roundtrip_resumable():
    sk = KllSketch(k=200, seed=9).update(RNG.uniform(0, 1, 10_000))
    back = KllSketch.from_bytes(sk.to_bytes())
    assert back.n == sk.n
    assert np.array_equal(back.quantile([0.1, 0.5, 0.9]),
                          sk.quantile([0.1, 0.5, 0.9]))
    # resumed sketch continues identically (same RNG state is NOT required;
    # estimates must stay in bound)
    more = RNG.uniform(0, 1, 10_000)
    sk.update(more)
    back.update(more)
    assert abs(sk.quantile(0.5) - back.quantile(0.5)) < 0.05


# --------------------------------------------------------------- t-digest

@pytest.mark.parametrize("dist", ["uniform", "lognormal"])
def test_tdigest_tail_accuracy(dist):
    n = 200_000
    data = (RNG.uniform(0, 1000, n) if dist == "uniform"
            else RNG.lognormal(3, 2, n))
    td = TDigest(delta=100).update(data)
    data_sorted = np.sort(data)
    for q in [0.001, 0.01, 0.5, 0.99, 0.999]:
        est = td.quantile(q)
        true_rank = np.searchsorted(data_sorted, est, side="right") / n
        tol = 1e-2 if q in (0.5,) else max(5e-3, 0.15 * min(q, 1 - q))
        assert abs(true_rank - q) <= tol, \
            f"{dist} q={q}: rank {true_rank} (est {est})"


def test_tdigest_merge_deterministic_and_order_independent_estimates():
    data = RNG.normal(100, 15, 64_000)
    chunks = np.split(data, 64)
    parts = [TDigest(100).update(c) for c in chunks]
    seq = TDigest(100)
    for p_ in parts:
        seq.merge(TDigest.from_bytes(p_.to_bytes()))
    perm = TDigest(100)
    for i in RNG.permutation(64):
        perm.merge(TDigest.from_bytes(parts[i].to_bytes()))
    for q in [0.01, 0.5, 0.99]:
        ra = np.mean(data <= seq.quantile(q))
        rb = np.mean(data <= perm.quantile(q))
        assert abs(ra - rb) <= 2e-2
    # merging the same states twice is bit-deterministic
    again = TDigest(100)
    for p_ in parts:
        again.merge(TDigest.from_bytes(p_.to_bytes()))
    assert again.to_bytes() == seq.to_bytes()


def test_tdigest_centroid_budget():
    td = TDigest(delta=100).update(RNG.uniform(0, 1, 500_000))
    assert td.means.size <= 2 * 100, "centroid count must stay O(delta)"


def test_tdigest_serde():
    td = TDigest(100).update(np.arange(1000, dtype=float))
    back = TDigest.from_bytes(td.to_bytes())
    assert back.to_bytes() == td.to_bytes()
    assert back.quantile(0.5) == td.quantile(0.5)
    assert back.cdf(500) == pytest.approx(0.5, abs=0.02)
