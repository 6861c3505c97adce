"""asof_join / range_join_point — shuffle-bounded temporal and interval
joins checked against pandas merge_asof and brute-force inequality joins."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mdbloom.spark.joins import asof_join, range_join_point


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.RandomState(7)
    n_l, n_r = 400, 150
    left = pd.DataFrame({
        "k": rng.randint(0, 8, n_l),
        "t": rng.randint(0, 10_000, n_l).astype("int64"),
        "lv": np.arange(n_l),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 8, n_r),
        "t": rng.randint(0, 10_000, n_r).astype("int64"),
        "rv": np.arange(n_r) * 10,
        "tag": [f"r{i % 5}" for i in range(n_r)],
    }).drop_duplicates(["k", "t"])  # asof needs unique (key, ts)
    return (left, right,
            spark.createDataFrame(left).repartition(7),
            spark.createDataFrame(right).repartition(5))


def _merge_asof(left, right, direction, tol=None):
    kw = {"tolerance": tol} if tol is not None else {}
    return (pd.merge_asof(
        left.sort_values(["t", "lv"]), right.sort_values("t"),
        on="t", by="k", direction=direction, suffixes=("", "_r"), **kw)
        .sort_values("lv").reset_index(drop=True))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(frames, direction):
    lpd, rpd, l, r = frames
    got = (asof_join(l, r, "k", left_ts="t", direction=direction)
           .toPandas().sort_values("lv").reset_index(drop=True))
    rr = rpd.rename(columns={"t": "t_r"})
    want = (pd.merge_asof(
        lpd.sort_values(["t", "lv"]), rr.sort_values("t_r"),
        left_on="t", right_on="t_r", by="k", direction=direction)
        .sort_values("lv").reset_index(drop=True))
    # matched right value, timestamp and tag agree row-by-row (NaN==NaN)
    assert got["rv"].equals(want["rv"])
    assert got["t_r"].astype("float64").equals(
        want["t_r"].astype("float64"))
    assert got["tag"].equals(want["tag"])


def test_asof_tolerance(frames):
    lpd, rpd, l, r = frames
    got = (asof_join(l, r, "k", left_ts="t", tolerance=F.lit(100))
           .toPandas().sort_values("lv").reset_index(drop=True))
    want = _merge_asof(lpd, rpd, "backward", tol=100)
    assert got["rv"].equals(want["rv"])


def test_asof_equal_ts_matches(spark):
    l = spark.createDataFrame([(1, 50, "L")], "k int, t int, lv string")
    r = spark.createDataFrame([(1, 50, "R"), (1, 49, "old")],
                              "k int, t int, rv string")
    out = asof_join(l, r, "k", left_ts="t").collect()[0]
    assert out.rv == "R" and out.t_r == 50  # ties match, latest wins


def test_asof_unmatched_left_keeps_nulls(spark):
    l = spark.createDataFrame([(1, 10), (2, 10)], "k int, t int")
    r = spark.createDataFrame([(1, 5)], "k int, t int")
    rows = {x.k: x for x in asof_join(l, r, "k", left_ts="t").collect()}
    assert rows[1].t_r == 5 and rows[2].t_r is None


def test_asof_plan_single_shuffle(frames):
    _, _, l, r = frames
    plan = asof_join(l, r, "k", left_ts="t") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.fixture(scope="module")
def ranges(spark):
    rng = np.random.RandomState(11)
    pts = pd.DataFrame({"p": rng.uniform(0, 1000, 500),
                        "pid": np.arange(500)})
    lo = rng.uniform(0, 950, 60)
    ivs = pd.DataFrame({"lo": lo, "hi": lo + rng.uniform(5, 80, 60),
                        "iid": np.arange(60)})
    return pts, ivs, spark.createDataFrame(pts), spark.createDataFrame(ivs)


def _brute(pts, ivs):
    out = pts.merge(ivs, how="cross")
    out = out[(out["p"] >= out["lo"]) & (out["p"] < out["hi"])]
    return set(zip(out["pid"], out["iid"]))


def test_range_join_inner_matches_brute_force(ranges):
    pts, ivs, P, I = ranges
    for w in (8.0, 64.0, 1000.0):  # narrow, typical, one-bin-covers-all
        got = set((r.pid, r.iid) for r in
                  range_join_point(P, I, "p", "lo", "hi", w).collect())
        assert got == _brute(pts, ivs)


def test_range_join_left_adds_unmatched(ranges):
    pts, ivs, P, I = ranges
    out = range_join_point(P, I, "p", "lo", "hi", 64.0, how="left") \
        .toPandas()
    matched_pids = {pid for pid, _ in _brute(pts, ivs)}
    nulls = out[out["iid"].isna()]
    assert set(nulls["pid"]) == set(pts["pid"]) - matched_pids
    # every point appears; matched rows agree with inner
    assert set(out[out["iid"].notna()]
               .apply(lambda r: (r["pid"], r["iid"]), axis=1)) \
        == _brute(pts, ivs)


def test_range_join_extra_key(spark):
    P = spark.createDataFrame([(1, 5.0, "a"), (2, 5.0, "b")],
                              "g int, p double, pid string")
    I = spark.createDataFrame([(1, 0.0, 10.0, "i1"), (2, 6.0, 9.0, "i2")],
                              "g int, lo double, hi double, iid string")
    got = [(r.pid, r.iid) for r in
           range_join_point(P, I, "p", "lo", "hi", 4.0,
                            extra_on="g").collect()]
    assert got == [("a", "i1")]  # g=2 point misses its own interval


def test_range_join_no_cartesian(ranges):
    _, _, P, I = ranges
    plan = range_join_point(P, I, "p", "lo", "hi", 64.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_null_right_ts_is_no_match(spark):
    """A NULL right timestamp satisfies no as-of predicate (ts >= NULL
    is never true in SQL) — it must not become a phantom match."""
    l = spark.createDataFrame([(1, 100)], "k int, t int")
    r = spark.createDataFrame([(1, None, "phantom"), (1, 200, "future")],
                              "k int, t int, rv string")
    out = asof_join(l, r, "k", left_ts="t").collect()[0]
    assert out.rv is None and out.t_r is None
    # forward: t=200 IS a valid match; the NULL row still is not
    fwd = asof_join(l, r, "k", left_ts="t",
                    direction="forward").collect()[0]
    assert fwd.rv == "future" and fwd.t_r == 200


def test_asof_null_left_ts_is_no_match(spark):
    l = spark.createDataFrame([(1, None)], "k int, t int")
    r = spark.createDataFrame([(1, 5, "x")], "k int, t int, rv string")
    for d in ("backward", "forward"):
        out = asof_join(l, r, "k", left_ts="t", direction=d).collect()[0]
        assert out.rv is None and out.t_r is None


def test_range_join_left_null_payload_not_duplicated(spark):
    """NULL-safe anti-join: a matched point with a NULL payload column
    must not reappear as a spurious unmatched row."""
    P = spark.createDataFrame([(1, 5.0, None), (2, 99.0, "note")],
                              "pid int, p double, note string")
    I = spark.createDataFrame([(7, 0.0, 10.0)],
                              "iid int, lo double, hi double")
    out = range_join_point(P, I, "p", "lo", "hi", 8.0, how="left") \
        .toPandas().sort_values("pid").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "pid"] == 1 and out.loc[0, "iid"] == 7
    assert out.loc[1, "pid"] == 2 and pd.isna(out.loc[1, "iid"])
