"""Distributed EWAH bitmap index (SURVEY §2.4 F8 at scale): partial
compressed bitmaps per Arrow batch, streaming OR merge per group, exact
pairwise set algebra — parity against plain Python sets."""

import numpy as np
import pytest

from mdbloom.ewah import EwahBitmap
from mdbloom.spark.bitmapindex import group_bitmaps, set_algebra_pairs


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.default_rng(7)
    rows = [(g, int(k))
            for g in ("a", "b", "c")
            for k in rng.choice(500, size=rng.integers(40, 200),
                                replace=True)]
    # duplicates on purpose: the pair-dedup stage must absorb them
    return spark.createDataFrame(rows, "grp string, key long"), {
        g: {k for gg, k in rows if gg == g} for g in ("a", "b", "c")}


def test_group_bitmaps_match_sets(spark, toy):
    df, truth = toy
    # many input partitions -> several partial bitmaps per group, so the
    # merge stage actually merges
    out = {r["group"]: r for r in
           group_bitmaps(df.repartition(8), "grp", "key", 500).collect()}
    assert set(out) == set(truth)
    for g, want in truth.items():
        bm = EwahBitmap.from_bytes(out[g]["bm"])
        assert bm.n_words == (500 + 63) // 64
        got = {int(p) for p in np.flatnonzero(
            np.unpackbits(bm.to_dense().view(np.uint8), bitorder="little"))}
        assert got == want
        assert out[g]["card"] == len(want)


def test_set_algebra_pairs_match_sets(spark, toy):
    df, truth = toy
    rows = set_algebra_pairs(spark, df.repartition(8), "grp", "key",
                             500).collect()
    assert len(rows) == 3   # C(3,2)
    for r in rows:
        a, b = truth[r["type_a"]], truth[r["type_b"]]
        assert r["type_a"] < r["type_b"]
        assert (r["card_a"], r["card_b"]) == (len(a), len(b))
        assert r["inter_card"] == len(a & b)
        assert r["union_card"] == len(a | b)
        assert r["xor_card"] == len(a ^ b)


def test_out_of_domain_keys_rejected(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 999), ("a", -1), ("b", 0), ("b", None)],
        "grp string, key long")
    out = {r["group"]: r["card"]
           for r in group_bitmaps(df, "grp", "key", 10).collect()}
    assert out == {"a": 1, "b": 1}   # 999 / -1 / null filtered, not crashed
