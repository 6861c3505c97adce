"""Shape math parity with the reference's test shapes.

Reference: Shape(id, 3, 1/10000) -> m=58, k=13 (`IndexTest.java:47`);
Shape(fn, 3, 1/3000000) -> m=94, k=22 (`ContainerImplTest.java:42`).
"""

import math

import pytest

from mdbloom.shape import Shape


def test_contract_shape():
    s = Shape.from_np(3, 1.0 / 10000)
    assert (s.m, s.k) == (58, 13)
    assert s.words == 1


def test_container_shape():
    s = Shape.from_np(3, 1.0 / 3000000)
    assert (s.m, s.k) == (94, 22)
    assert s.words == 2


def test_actual_probability_formula():
    s = Shape.from_np(1000, 0.01)
    expect = (1 - math.exp(-s.k * s.n / s.m)) ** s.k
    assert s.probability == pytest.approx(expect)
    assert s.probability <= 0.011  # achieved p near target


def test_from_mk_roundtrip():
    s = Shape.from_mk(58, 13, n=3)
    assert s.m == 58 and s.k == 13 and s.n == 3


def test_estimate_n_swamidass_baldi():
    s = Shape.from_np(1000, 0.01)
    # after inserting ~n items, popcount c ~ m(1 - e^{-kn/m}); invert
    c = int(s.m * (1 - math.exp(-s.k * 500 / s.m)))
    assert s.estimate_n(c) == pytest.approx(500, rel=0.02)


def test_gate_shape_default_population():
    s = Shape.from_np(3, 1e-4)
    g = s.gate_shape()
    # default estimated population = 1/p (ContainerImpl.java:70-72)
    assert g.n >= int(1 / s.probability) * 0.5


def test_invalid_args():
    with pytest.raises(ValueError):
        Shape.from_np(0, 0.01)
    with pytest.raises(ValueError):
        Shape.from_np(10, 1.5)
