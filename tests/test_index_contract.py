"""Index contract suite — pytest port of the reference's JUnit contract
tests (`IndexTest.java:43-140`), parametrized over every index strategy the
way the six `@ContractImpl` suites instantiate it (FlatBloofiTest,
LinearTest, RangePackedTest, BlockedSetIndexTest, Tri4Test, Tri8Test).

Shape: n=3, p=1/10000 -> m=58, k=13 (`IndexTest.java:47`). Hashers are
pinned-bit, mirroring the CachingHasher fixtures whose (h1, h2=0) pairs pin
exactly one bit (`IndexTest.java:68,84-85,104-107`).
"""

import numpy as np
import pytest

from mdbloom.container import INDEX_STRATEGIES, PinnedHasher
from mdbloom.shape import Shape

SHAPE = Shape.from_np(3, 1.0 / 10000)

STRATEGIES = sorted(INDEX_STRATEGIES)


@pytest.fixture(params=STRATEGIES)
def index(request):
    return INDEX_STRATEGIES[request.param](SHAPE)


def filt(*bits):
    return PinnedHasher(bits).filter(SHAPE)


def test_shape_reproduces_reference():
    assert (SHAPE.m, SHAPE.k) == (58, 13)


def test_get_roundtrip(index):
    """`IndexTest.getTest` (:66-74): store {29,13}, exact-get it back."""
    f = filt(29, 13)
    key = index.create(f)
    index.put(key, f)
    assert index.get(filt(29, 13)) == key


def test_get_not_found(index):
    """`IndexTest.getTest_NotFound` (:76-80)."""
    assert index.get(filt(29, 13)) is None


def test_get_partial_must_fail(index):
    """`IndexTest.getTest_PartialMatch` (:82-88): a subset filter must NOT
    exact-match — get is bit-for-bit."""
    f = filt(29, 13)
    index.put(index.create(f), f)
    assert index.get(filt(29)) is None
    # and a superset must not exact-match either
    assert index.get(filt(29, 13, 14)) is None


def test_remove(index):
    """`IndexTest.removeTest` (:90-100)."""
    f = filt(29, 13)
    key = index.create(f)
    index.put(key, f)
    assert index.get(f) == key
    index.remove(key)
    assert index.get(f) is None
    assert index.filter_count == 0
    assert index.search(filt(29)) == []


FOUR = [filt(29, 13), filt(29, 14), filt(30, 13), filt(29, 30)]


@pytest.mark.parametrize("query_bits,expected_idx", [
    ((29, 13), [0]),         # exact-width -> only filter 1
    ((29,), [0, 1, 3]),      # one bit -> filters 1,2,4
    ((13,), [0, 2]),         # other bit -> filters 1,3
    ((29, 13, 14), []),      # superset of any stored -> nothing
])
def test_search(index, query_bits, expected_idx):
    """`IndexTest.searchTest` (:102-140) with the exact four-filter fixture."""
    keys = []
    for f in FOUR:
        k = index.create(f)
        index.put(k, f)
        keys.append(k)
    got = sorted(index.search(filt(*query_bits)))
    assert got == sorted(keys[i] for i in expected_idx)


def test_put_dedups_identical_filters(index):
    f = filt(29, 13)
    key = index.create(f)
    index.put(key, f)
    index.put(key, f)
    assert index.filter_count == 1


def test_get_all(index):
    for f in FOUR:
        index.put(index.create(f), f)
    assert len(index.get_all()) == 4
    assert index.filter_count == 4


def test_slot_reuse_after_remove():
    """FlatSlab slot recycling (`FlatBloofi.java:153-174` free-list)."""
    import itertools
    idx = INDEX_STRATEGIES["flat"](SHAPE, capacity=2)
    pairs = list(itertools.islice(itertools.combinations(range(SHAPE.m), 2), 100))
    fs = [filt(*p) for p in pairs]
    keys = [idx.create(f) for f in fs]
    for k, f in zip(keys, fs):
        idx.put(k, f)
    assert idx.filter_count == 100
    for k in keys[:50]:
        idx.remove(k)
    assert idx.filter_count == 50
    # removed filters no longer match; survivors still do
    assert idx.get(fs[0]) is None
    assert idx.get(fs[99]) == keys[99]
    # refill reuses freed slots without losing correctness
    triples = list(itertools.islice(itertools.combinations(range(SHAPE.m), 3), 30))
    fs2 = [filt(*t) for t in triples]
    for f in fs2:
        idx.put(idx.create(f), f)
    assert idx.filter_count == 80
    assert idx.get(fs2[7]) == idx.create(fs2[7])


def test_strategies_agree_on_random_population():
    """All index strategies must return identical result sets on a random
    population — the cross-strategy analogue of running one JUnit contract
    against six impls."""
    rng = np.random.default_rng(7)
    pops = [tuple(sorted(rng.choice(SHAPE.m, size=rng.integers(2, 8),
                                    replace=False).tolist()))
            for _ in range(200)]
    indexes = {name: cls(SHAPE) for name, cls in INDEX_STRATEGIES.items()}
    for bits in pops:
        f = filt(*bits)
        for idx in indexes.values():
            idx.put(idx.create(f), f)
    for _ in range(50):
        qbits = tuple(rng.choice(SHAPE.m, size=rng.integers(1, 4),
                                 replace=False).tolist())
        results = {name: sorted(idx.search(filt(*qbits)))
                   for name, idx in indexes.items()}
        vals = list(results.values())
        assert all(v == vals[0] for v in vals), f"divergence on {qbits}: " \
            f"{ {n: len(r) for n, r in results.items()} }"


# ---------------------------------------------------------------- Bloofi

def test_bloofi_splits_grow_a_real_tree():
    """Past ``order`` entries the leaf must split and an inner level with
    OR-values appear (Bloofi paper §3.2); search stays exact vs Linear."""
    from mdbloom.container import BloofiIndex, LinearIndex

    rng = np.random.default_rng(11)
    bloofi = BloofiIndex(SHAPE, order=4)
    lin = LinearIndex(SHAPE)
    pops = [tuple(sorted(rng.choice(SHAPE.m, size=4, replace=False).tolist()))
            for _ in range(60)]
    for bits in pops:
        f = filt(*bits)
        for idx in (bloofi, lin):
            idx.put(idx.create(f), f)
    assert bloofi.depth() >= 2          # at least two inner levels
    assert bloofi.filter_count == lin.filter_count
    for _ in range(30):
        q = filt(*rng.choice(SHAPE.m, size=rng.integers(1, 4),
                             replace=False).tolist())
        assert sorted(bloofi.search(q)) == sorted(lin.search(q))
    # every node respects the order bound and parents OR their children
    stack = [bloofi._root]
    while stack:
        node = stack.pop()
        assert node.size() <= bloofi.order
        if not node.leaf:
            acc = np.bitwise_or.reduce(
                np.stack([c.value for c in node.children]), axis=0)
            assert np.array_equal(acc, node.value)
            stack.extend(node.children)


def test_bloofi_remove_recomputes_or_values():
    """ORs are not subtractable: after removing the only filter holding a
    bit, a query on that bit must return nothing (stale ancestor ORs would
    still descend and, worse, a stale leaf OR would false-positive)."""
    from mdbloom.container import BloofiIndex

    idx = BloofiIndex(SHAPE, order=4)
    fs = [filt(i, i + 1) for i in range(0, 40, 2)]
    keys = []
    for f in fs:
        k = idx.create(f)
        idx.put(k, f)
        keys.append(k)
    lone = filt(55, 56, 57)
    lone_key = idx.create(lone)
    idx.put(lone_key, lone)
    assert idx.search(filt(56)) == [lone_key]
    idx.remove(lone_key)
    assert idx.search(filt(56)) == []
    assert idx.get(lone) is None
    # root OR no longer carries the removed bits anywhere in the tree
    stack = [idx._root]
    while stack:
        node = stack.pop()
        assert not B_contains_bit(node.value, 56)
        if not node.leaf:
            stack.extend(node.children)
    # drain fully: tree collapses to empty, then refills cleanly
    for k in keys:
        idx.remove(k)
    assert idx.filter_count == 0 and idx._root is None
    f = filt(3, 9)
    idx.put(idx.create(f), f)
    assert idx.search(filt(9)) == [idx.create(f)]


def B_contains_bit(packed, bit):
    word, off = divmod(bit, 64)
    return bool((int(packed[word]) >> off) & 1)


def test_bloofi_churn_agrees_with_linear():
    """Random interleaved put/remove churn — OR recompute + node pruning
    must never diverge from the full-scan ground truth."""
    from mdbloom.container import BloofiIndex, LinearIndex

    rng = np.random.default_rng(23)
    bloofi = BloofiIndex(SHAPE, order=4)
    lin = LinearIndex(SHAPE)
    live = []
    for step in range(300):
        if live and rng.random() < 0.4:
            k, _ = live.pop(rng.integers(len(live)))
            bloofi.remove(k)
            lin.remove(k)
        else:
            f = filt(*sorted(rng.choice(
                SHAPE.m, size=rng.integers(2, 6), replace=False).tolist()))
            k = bloofi.create(f)
            if all(kk != k for kk, _ in live):
                live.append((k, f))
            bloofi.put(k, f)
            lin.put(k, f)
        if step % 25 == 0:
            q = filt(*rng.choice(SHAPE.m, size=2, replace=False).tolist())
            assert sorted(bloofi.search(q)) == sorted(lin.search(q))
    assert bloofi.filter_count == lin.filter_count == len(live)


def test_bloofi_depth_bounded_under_churn():
    """Regression for the r3 ADVICE structural defect: with order=2 and
    3000 interleaved put/remove steps the old greedy split (no minimum
    fill) plus empty-only pruning accumulated degree-1 inner chains —
    measured depth 56 for 257 live filters. Min-fill splits + degree-1
    splicing must keep worst-case probe depth O(log_order N)."""
    import math

    from mdbloom.container import BloofiIndex, LinearIndex

    rng = np.random.default_rng(7)
    bloofi = BloofiIndex(SHAPE, order=2)
    lin = LinearIndex(SHAPE)
    live = []
    for step in range(3000):
        if live and rng.random() < 0.45:
            k, _ = live.pop(rng.integers(len(live)))
            bloofi.remove(k)
            lin.remove(k)
        else:
            f = filt(*sorted(rng.choice(
                SHAPE.m, size=rng.integers(2, 6), replace=False).tolist()))
            k = bloofi.create(f)
            if all(kk != k for kk, _ in live):
                live.append((k, f))
            bloofi.put(k, f)
            lin.put(k, f)
    n = bloofi.filter_count
    assert n == lin.filter_count == len(live) and n >= 100
    bound = 3 * math.log(n, max(bloofi.order, 2)) + 2
    assert bloofi.depth() <= bound, (bloofi.depth(), n, bound)
    # structure invariants survive churn: order bound + parent ORs exact,
    # and no non-root inner node is left with a single child
    stack = [bloofi._root]
    while stack:
        node = stack.pop()
        if node.leaf:
            assert node.size() <= bloofi.order
        else:
            # inner capacity is max(order, 3): splits must yield two
            # halves of >= 2 children each (see BloofiIndex._capacity)
            assert 2 <= node.size() <= max(bloofi.order, 3) \
                or node is bloofi._root
            acc = np.bitwise_or.reduce(
                np.stack([c.value for c in node.children]), axis=0)
            assert np.array_equal(acc, node.value)
            stack.extend(node.children)
    # search stays exact vs the full-scan ground truth
    for _ in range(25):
        q = filt(*rng.choice(SHAPE.m, size=rng.integers(1, 4),
                             replace=False).tolist())
        assert sorted(bloofi.search(q)) == sorted(lin.search(q))
