"""Spark sketch-aggregation surface vs exact Spark oracles, plus
partitioning-invariance of the distributed merges."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mdbloom.sketches import CountMinSketch, HllSketch, KllSketch, TDigest
from mdbloom.spark.aggregate import (
    bloom_of,
    cms_frequencies,
    hll_distinct,
    kll_quantiles,
    sketch_all,
    sketch_by_key,
    tdigest_quantiles,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet").cache()


def test_hll_matches_exact_distinct(spark, events):
    est = hll_distinct(events, "user_id", p=14)
    true = events.select(F.countDistinct("user_id")).collect()[0][0]
    assert abs(est - true) / true <= 3 * 1.04 / np.sqrt(2 ** 14)


def test_hll_partitioning_invariant(spark, events):
    a = hll_distinct(events.repartition(3), "user_id")
    b = hll_distinct(events.repartition(17), "user_id")
    assert a == b  # max-merge registers are partitioning-independent


def test_cms_never_underestimates(spark, events):
    true = {r.event_type: r.c for r in
            events.groupBy("event_type").agg(F.count("*").alias("c"))
            .collect()}
    probes = sorted(true)
    est = cms_frequencies(events, "event_type", probes, eps=1e-4)
    n = sum(true.values())
    for p_, e in zip(probes, est):
        assert true[p_] <= e <= true[p_] + 1e-4 * n * 3 + 1


def test_kll_quantiles_close_to_exact(spark, events):
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est = kll_quantiles(events, "value", qs)
    exact = events.selectExpr(
        *[f"percentile(value, {q}) as q{i}" for i, q in enumerate(qs)]
    ).collect()[0]
    vals = events.select("value").toPandas()["value"].to_numpy()
    n = len(vals)
    for q, e in zip(qs, est):
        rank = (vals <= e).mean()
        assert abs(rank - q) <= 3 * 0.7 / 200 + 2e-3


def test_tdigest_quantiles_close_to_exact(spark, events):
    qs = [0.001, 0.5, 0.999]
    est = tdigest_quantiles(events, "value", qs)
    vals = events.select("value").toPandas()["value"].to_numpy()
    for q, e in zip(qs, est):
        rank = (vals <= e).mean()
        assert abs(rank - q) <= max(1e-2, 0.2 * min(q, 1 - q))


def test_bloom_of_membership(spark, events):
    sk = bloom_of(events, "event_type", n=100, p=1e-3)
    types = [r.event_type for r in events.select("event_type")
             .distinct().collect()]
    assert sk.contains(np.array(types, dtype=object)).all()
    absent = np.array([f"nope{i}" for i in range(1000)], dtype=object)
    assert sk.contains(absent).mean() <= 0.01


def test_sketch_by_key_two_phase_parity_and_plan(spark, events):
    """VERDICT r1 item 1: sketch_by_key must be a partial/final two-phase
    aggregation. (a) per-key state == sketch_all over that key's rows
    (byte-identical, HLL register max-merge is order-independent);
    (b) the plan's group-merge stage consumes only partial STATES, never
    the raw rows — no single-group applyInPandas OOM cliff."""
    out = sketch_by_key(events, ["event_type"], "user_id",
                        lambda: HllSketch(12))
    per_key = {r.event_type: bytes(r.state) for r in out.collect()}
    for et, state in sorted(per_key.items())[:2]:
        solo = sketch_all(events.where(F.col("event_type") == et),
                          "user_id", lambda: HllSketch(12),
                          HllSketch.from_bytes)
        assert state == solo.to_bytes()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the groupBy merge (FlatMapGroupsInPandas) must sit ABOVE the
    # mapInPandas partial stage, i.e. raw-row operators (scan) feed
    # MapInPandas first
    assert "FlatMapGroupsInPandas" in plan and "MapInPandas" in plan
    assert plan.index("FlatMapGroupsInPandas") < plan.index("MapInPandas")


def test_sketch_by_key_partitioning_invariant(spark, events):
    a = sketch_by_key(events.repartition(3), ["event_type"], "user_id",
                      lambda: HllSketch(12),
                      estimate=lambda s: s.estimate())
    b = sketch_by_key(events.repartition(17), ["event_type"], "user_id",
                      lambda: HllSketch(12),
                      estimate=lambda s: s.estimate())
    ra = {r.event_type: (bytes(r.state), r.estimate) for r in a.collect()}
    rb = {r.event_type: (bytes(r.state), r.estimate) for r in b.collect()}
    assert ra == rb


def test_sketch_by_key_states_merge_to_global(spark, events):
    per_key = sketch_by_key(events, ["event_type"], "user_id",
                            lambda: HllSketch(12),
                            estimate=lambda s: s.estimate()).collect()
    # per-group estimates match exact per-group distincts
    true = {r.event_type: r.d for r in
            events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d")).collect()}
    merged = HllSketch(12)
    for row in per_key:
        est, t = row.estimate, true[row.event_type]
        assert abs(est - t) / t <= 3 * 1.04 / np.sqrt(2 ** 12)
        merged.merge(HllSketch.from_bytes(bytes(row.state)))
    # merging group states == sketching the whole table (byte-identical)
    whole = sketch_all(events, "user_id", lambda: HllSketch(12),
                       HllSketch.from_bytes)
    assert merged.to_bytes() == whole.to_bytes()


def test_hll_sql_within_error_bound(spark, events):
    """The all-JVM (codegen md5-hash) HLL path: per-key estimates within
    the published 3-sigma bound of exact distinct counts."""
    from mdbloom.spark.aggregate import hll_by_key_sql
    got = {r.event_type: r.estimate
           for r in hll_by_key_sql(events, ["event_type"], "user_id",
                                   p=14).collect()}
    true = {r.event_type: r.d for r in
            events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d")).collect()}
    assert set(got) == set(true)
    for k, d in true.items():
        assert abs(got[k] - d) / max(d, 1) <= 3 * 1.04 / np.sqrt(2 ** 14)


def test_hll_sql_partitioning_invariant(spark, events):
    """Registers come from groupBy max -> identical for any partitioning,
    and the SQL-path estimate is deterministic across runs."""
    from mdbloom.spark.aggregate import hll_by_key_sql
    a = sorted((r.event_type, r.estimate) for r in hll_by_key_sql(
        events.repartition(3), ["event_type"], "user_id").collect())
    b = sorted((r.event_type, r.estimate) for r in hll_by_key_sql(
        events.repartition(17), ["event_type"], "user_id").collect())
    assert a == b


def test_hll_sql_registers_feed_library_estimator(spark, events):
    """hll_registers_sql rows folded into HllSketch by hand equal the
    hll_by_key_sql estimates — the finalize IS the library estimator."""
    from mdbloom.spark.aggregate import hll_by_key_sql, hll_registers_sql
    p = 12
    regs = hll_registers_sql(events, ["event_type"], "user_id",
                             p=p).toPandas()
    want = {r.event_type: r.estimate
            for r in hll_by_key_sql(events, ["event_type"], "user_id",
                                    p=p).collect()}
    for k, grp in regs.groupby("event_type"):
        arr = np.zeros(1 << p, dtype=np.uint8)
        arr[grp["idx"].to_numpy()] = grp["rho"].to_numpy()
        assert HllSketch(p, arr).estimate() == want[k]


def test_tdigest_weighted_matches_exact_in_singleton_regime(spark, events):
    """Pre-aggregated weighted digest at singleton-preserving delta:
    quantiles equal the exact weighted-histogram interpolation."""
    from mdbloom.spark.aggregate import tdigest_quantiles_weighted
    qs = np.array([0.001, 0.25, 0.5, 0.75, 0.999])
    got = tdigest_quantiles_weighted(events, "value", qs, delta=1e6)
    pdf = events.select("value").toPandas().dropna()
    vc = pdf["value"].value_counts().sort_index()
    v = vc.index.to_numpy(dtype=np.float64)
    w = vc.to_numpy(dtype=np.float64)
    cum = np.cumsum(w) - w / 2.0
    want = np.interp(qs * w.sum(), cum, (w * v) / w,
                     left=v[0], right=v[-1])
    assert np.array_equal(got, want)


def test_tdigest_weighted_partitioning_invariant(spark, events):
    from mdbloom.spark.aggregate import tdigest_quantiles_weighted
    qs = [0.01, 0.5, 0.99]
    a = tdigest_quantiles_weighted(events.repartition(3), "value", qs,
                                  delta=1e6)
    b = tdigest_quantiles_weighted(events.repartition(17), "value", qs,
                                  delta=1e6)
    assert np.array_equal(a, b)
