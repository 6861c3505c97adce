"""Hypothesis property tests for the pure-NumPy kernel laws (SURVEY §5:
the reference's JUnit suites check these on fixed fixtures —
`IndexTest.java`, `ContainerImplTest.java`; here the same invariants are
checked over generated inputs):

* merge (OR) is associative, commutative, idempotent and
  order-independent byte-for-byte (`EWAHBloomFilter.java:80-84`);
* pack/unpack round-trips exactly;
* slab containment == row-layout linear containment for every
  (population, query) (`FlatBloofi.java:188-205` vs `Linear.java:134-140`);
* EWAH or/and/xor are bit-exact vs dense ops and round-trip dense
  (`back/.../EWAHCompressedBitmap.java:382,1012,1698`).

All pure NumPy — no Spark session, milliseconds per example.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mdbloom import bits as B
from mdbloom import kernel as K
from mdbloom.ewah import EwahBitmap

MAX_M = 256


@st.composite
def bitsets(draw, m=None):
    m_ = m or draw(st.integers(min_value=1, max_value=MAX_M))
    n = draw(st.integers(min_value=0, max_value=min(m_, 48)))
    bits = draw(st.lists(st.integers(min_value=0, max_value=m_ - 1),
                         min_size=n, max_size=n, unique=True))
    return m_, np.array(sorted(bits), dtype=np.int64)


@given(bitsets())
@settings(max_examples=60, deadline=None)
def test_pack_unpack_roundtrip(mb):
    m, bits = mb
    packed = B.from_bits(bits, m)
    assert np.array_equal(np.flatnonzero(B.unpack(packed, m)), bits)


@given(st.integers(min_value=1, max_value=MAX_M), st.data())
@settings(max_examples=40, deadline=None)
def test_merge_or_laws(m, data):
    a = B.from_bits(data.draw(bitsets(m=m))[1], m)
    b = B.from_bits(data.draw(bitsets(m=m))[1], m)
    c = B.from_bits(data.draw(bitsets(m=m))[1], m)
    ab = B.merge_or(a, b)
    assert ab.tobytes() == B.merge_or(b, a).tobytes()          # commutes
    assert B.merge_or(ab, c).tobytes() == \
        B.merge_or(a, B.merge_or(b, c)).tobytes()              # associates
    assert B.merge_or(a, a).tobytes() == a.tobytes()           # idempotent
    assert B.merge_or(a, np.zeros_like(a)).tobytes() == a.tobytes()


@given(st.integers(min_value=1, max_value=MAX_M), st.data())
@settings(max_examples=40, deadline=None)
def test_slab_query_equals_linear_scan(m, data):
    n_filters = data.draw(st.integers(min_value=0, max_value=70))
    rows = [B.from_bits(data.draw(bitsets(m=m))[1], m)
            for _ in range(n_filters)]
    filters = (np.stack(rows) if rows
               else np.zeros((0, B.n_words(m)), dtype=B.U64))
    _, qbits = data.draw(bitsets(m=m))
    slab = K.build_slab(filters, m)
    got = K.query_slab(slab, qbits, n_filters)
    if qbits.size == 0:
        want = np.arange(n_filters, dtype=np.int64)  # empty matches all
    else:
        want = K.linear_search(filters, B.from_bits(qbits, m))
    assert np.array_equal(got, want)


@given(st.integers(min_value=1, max_value=8), st.data())
@settings(max_examples=40, deadline=None)
def test_ewah_binops_match_dense(n_words, data):
    def words():
        kinds = data.draw(st.lists(
            st.sampled_from(["zeros", "ones", "rand"]),
            min_size=n_words, max_size=n_words))
        out = np.zeros(n_words, dtype=B.U64)
        for i, kind in enumerate(kinds):
            if kind == "ones":
                out[i] = np.uint64(0xFFFFFFFFFFFFFFFF)
            elif kind == "rand":
                out[i] = np.uint64(data.draw(
                    st.integers(min_value=0, max_value=2 ** 64 - 1)))
        return out

    a, b = words(), words()
    ea, eb = EwahBitmap.from_dense(a), EwahBitmap.from_dense(b)
    assert np.array_equal((ea | eb).to_dense(), a | b)
    assert np.array_equal((ea & eb).to_dense(), a & b)
    assert np.array_equal((ea ^ eb).to_dense(), a ^ b)
    assert np.array_equal(ea.to_dense(), a)  # round-trip
    assert ea.cardinality() == int(B.popcount64(a).sum())


# ---------------- storage SPI serde law ----------------

_scalars = st.one_of(
    st.none(),
    st.text(max_size=40),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.binary(max_size=32),
    st.datetimes(min_value=__import__("datetime").datetime(1970, 1, 1),
                 max_value=__import__("datetime").datetime(2100, 1, 1)),
    st.dates(),
)


@given(st.dictionaries(
    st.text(min_size=1, max_size=20), _scalars, max_size=8))
@settings(max_examples=200, deadline=None)
def test_json_serde_round_trip_law(payload):
    """Serde law (`Serde.java:20-24`): deserialize(serialize(E)) == E for
    every payload dict of Spark scalar types — the property the storage
    SPI's KV backends depend on for value fidelity."""
    from mdbloom.spark.storage import JsonSerde
    s = JsonSerde()
    assert s.deserialize(s.serialize(payload)) == payload
