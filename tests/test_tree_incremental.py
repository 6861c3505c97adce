"""Incremental manifest-tree maintenance (BloomIndexWriter.
_refresh_manifest_tree): a resume/compact that touched a small dirty
shard set must refresh the pruning tree WITHOUT the L full passes over
the token stream the full rebuild costs — level-1 nodes rebuilt exactly
from partition-pruned reads, upper-level gates absorbing the dirty
shards' tokens by insertion (sound superset), fill-ratio-triggered
exact node rebuild.

Contracts verified here:
  * the incremental path actually engages on a small-dirty resume
    (``_last_tree_mode``) and falls back to the full rebuild when the
    dirty fraction is large;
  * level 1 is byte-identical to a from-scratch rebuild of the same
    final data (exact everywhere it matters most);
  * upper-level summaries are exact; upper-level gates keep the
    no-false-negative contract AT THE NODE'S OWN STORED SHAPE (insertion
    never resizes, so scratch-tree bytes are not comparable on nodes
    whose population changed — scratch re-sizes gate_m); untouched nodes
    stay byte-identical to scratch;
  * pruning parity: truth ⊆ incremental-tree ⊆ flat, and the
    incremental tree finds every token that exists only in the new rows;
  * TREE_FILL_REBUILD=0 forces every touched upper node through the
    exact-rebuild branch and the whole tree converges to the
    from-scratch bytes.
"""
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mdbloom import bits as B
from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.transcripts import synthesize_transcripts

N_SHARDS = 32
GROUP = 4


def _cfg():
    return IndexConfig(n_per_record=40, probability=1e-3,
                       n_shards=N_SHARDS, chunk_slots=256,
                       manifest_group_size=GROUP)


def _level(spark, path, lvl):
    return (spark.read.parquet(
        os.path.join(path, "manifest_tree", f"level={lvl}"))
        .toPandas().sort_values("grp").reset_index(drop=True))


def _levels(path):
    return sorted(int(d.split("=", 1)[1]) for d in os.listdir(
        os.path.join(path, "manifest_tree")) if d.startswith("level="))


@pytest.fixture(scope="module")
def incr_setup(spark, tmp_path_factory):
    """Index built on half the corpus, then resumed with one shard's rows
    extended by a sentinel token; a second index built from scratch on
    the identical final data is the exactness oracle."""
    base = tmp_path_factory.mktemp("treeinc")
    inc_path, full_path = str(base / "inc"), str(base / "full")
    df = synthesize_transcripts(spark, 3000, seed=21)
    shard_of = F.pmod(F.xxhash64("conv_id"), F.lit(N_SHARDS)).cast("int")
    unchanged = df.where(shard_of != 5)
    before = df.where(shard_of == 5)
    after = before.withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzqincrtok")))
    final = unchanged.unionByName(after)
    # tree_refresh="incremental" forces the path under test at this toy
    # shard count ("auto" correctly prefers the full rebuild below
    # TREE_INCREMENTAL_MIN_SHARDS — see test_auto_policy_gates_on_size)
    w = BloomIndexWriter(spark, _cfg(), tree_refresh="incremental")
    w.build(unchanged.unionByName(before), inc_path)
    assert w._last_tree_mode == "full"
    stats = w.build(final, inc_path, resume=True)
    BloomIndexWriter(spark, _cfg()).build(final, full_path)
    return {"w": w, "stats": stats, "inc": inc_path, "full": full_path,
            "final": final}


def test_incremental_mode_engages(incr_setup):
    assert incr_setup["stats"]["built"] == 1
    assert incr_setup["stats"]["skipped"] >= N_SHARDS - 2
    assert incr_setup["w"]._last_tree_mode == "incremental"


def test_level1_exact_vs_scratch(spark, incr_setup):
    """Level 1 (the sharpest level) never goes stale: byte-identical to
    the from-scratch tree on the same final data."""
    got = _level(spark, incr_setup["inc"], 1)
    want = _level(spark, incr_setup["full"], 1)
    assert list(got["grp"]) == list(want["grp"])
    for col in ("n_children", "gate_m", "gate_k", "n_tokens"):
        assert list(got[col].fillna(-1)) == list(want[col].fillna(-1)), col
    for a, b in zip(got["summary"], want["summary"]):
        assert bytes(a) == bytes(b)
    for a, b in zip(got["token_gate"], want["token_gate"]):
        assert bytes(a) == bytes(b)


def test_upper_levels_superset_gates_exact_summaries(spark, incr_setup):
    """Upper levels: summaries exact (re-folded). Gates: the node's OWN
    stored shape must still cover every member token's probe positions
    (no false negatives — the descent hashes queries at the stored
    (gate_m, gate_k), so THAT is the contract; scratch bytes are only
    comparable on nodes the resume never touched, where they must be
    byte-identical)."""
    import pandas as pd
    assert _levels(incr_setup["inc"]) == _levels(incr_setup["full"])
    w = incr_setup["w"]
    keys = w._stream_keys
    tok = spark.read.parquet(
        os.path.join(incr_setup["inc"], "token_hashes"))
    for lvl in _levels(incr_setup["inc"])[1:]:
        got = _level(spark, incr_setup["inc"], lvl)
        want = _level(spark, incr_setup["full"], lvl)
        assert list(got["grp"]) == list(want["grp"]), lvl
        for a, b in zip(got["summary"], want["summary"]):
            assert bytes(a) == bytes(b), lvl
        span = GROUP ** lvl
        dirty_grp = 5 // span  # the resumed shard's ancestor at this level
        # untouched nodes: full byte parity with scratch
        for _, (g, wrow) in enumerate(zip(got.itertuples(),
                                          want.itertuples())):
            if int(g.grp) == dirty_grp:
                continue
            assert (g.token_gate is None) == (wrow.token_gate is None), lvl
            if g.token_gate is not None:
                assert bytes(g.token_gate) == bytes(wrow.token_gate), lvl
        # every non-NULL gate covers its members at its OWN stored shape
        shapes = {int(r["grp"]): (int(r["gate_m"]), int(r["gate_k"]))
                  for _, r in got.iterrows()
                  if r["token_gate"] is not None and pd.notna(r["gate_m"])}
        if not shapes:
            continue
        req = (tok.withColumn("grp", F.expr(f"shard div {span}"))
               .where(F.col("grp").isin(list(shapes)))
               .select("grp", *keys).dropDuplicates(["grp", *keys])
               .groupBy("grp")
               .applyInPandas(w._delta_gate_udf(shapes),
                              schema="grp long, delta binary")
               .toPandas())
        gates = {int(r["grp"]): bytes(r["token_gate"])
                 for _, r in got.iterrows() if r["token_gate"] is not None}
        for _, r in req.iterrows():
            g = int(r["grp"])
            need = np.frombuffer(bytes(r["delta"]), dtype=B.U64)
            have = np.frombuffer(gates[g], dtype=B.U64)
            assert np.array_equal(have & need, need), (lvl, g)


def test_pruning_parity_and_new_token_found(spark, incr_setup):
    """truth ⊆ incremental-tree ⊆ flat for every query; the token that
    exists only in the resumed rows survives the descent."""
    r = BloomIndexReader(spark, incr_setup["inc"])
    queries = {
        "new": ["tok=zzqincrtok"],
        "absent": ["tok=zzqnowhere"],
        "common": r.transcript_query_tokens("assistant", None,
                                            ["w00001"]),
    }
    flat = r.prune_shards_many_distributed(queries, use_tree=False)
    tree = r.prune_shards_many_distributed(queries, use_tree=True)
    for qid in queries:
        assert set(tree[qid]) <= set(flat[qid]), qid
    assert 5 in tree["new"]
    assert tree["absent"] == []
    # and the full index's tree agrees on the new token's home shard
    r2 = BloomIndexReader(spark, incr_setup["full"])
    assert 5 in r2.prune_shards_many_distributed(
        {"new": ["tok=zzqincrtok"]}, use_tree=True)["new"]


def test_fill_trigger_rebuilds_to_scratch_bytes(spark, tmp_path,
                                                monkeypatch):
    """TREE_FILL_REBUILD=0 makes every inserted upper node take the
    exact-rebuild branch — the whole tree must then converge to the
    from-scratch bytes (including resized gate_m and fresh n_tokens)."""
    monkeypatch.setattr(BloomIndexWriter, "TREE_FILL_REBUILD", 0.0)
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    df = synthesize_transcripts(spark, 2000, seed=23)
    shard_of = F.pmod(F.xxhash64("conv_id"), F.lit(N_SHARDS)).cast("int")
    final = df.withColumn(
        "text",
        F.when(shard_of == 3,
               F.concat(F.col("text"), F.lit(" zzqgrow"))).otherwise(
            F.col("text")))
    w = BloomIndexWriter(spark, _cfg(), tree_refresh="incremental")
    w.build(df, inc_path)
    w.build(final, inc_path, resume=True)
    assert w._last_tree_mode == "incremental"
    BloomIndexWriter(spark, _cfg()).build(final, full_path)
    for lvl in _levels(inc_path):
        got = _level(spark, inc_path, lvl)
        want = _level(spark, full_path, lvl)
        assert list(got["grp"]) == list(want["grp"]), lvl
        for col in ("gate_m", "gate_k", "n_tokens"):
            assert list(got[col].fillna(-1)) == \
                list(want[col].fillna(-1)), (lvl, col)
        for a, b in zip(got["token_gate"], want["token_gate"]):
            assert (a is None) == (b is None)
            if a is not None:
                assert bytes(a) == bytes(b), lvl


def test_auto_policy_gates_on_size(spark, tmp_path, monkeypatch):
    """tree_refresh="auto" (the default) takes the incremental path only
    at >= TREE_INCREMENTAL_MIN_SHARDS (measured crossover: 0.7x full at
    1024 shards, 1.7x at 8192 — scripts/tree_incr_bench.py); "full"
    never takes it; a bogus policy is rejected at construction."""
    path = str(tmp_path / "idx")
    df = synthesize_transcripts(spark, 1500, seed=37)
    shard_of = F.pmod(F.xxhash64("conv_id"), F.lit(N_SHARDS)).cast("int")
    touched = df.withColumn(
        "text", F.when(shard_of == 2,
                       F.concat(F.col("text"), F.lit(" zzauto")))
        .otherwise(F.col("text")))
    w = BloomIndexWriter(spark, _cfg())  # default auto
    assert w.tree_refresh == "auto"
    w.build(df, path)
    w.build(touched, path, resume=True)
    assert w._last_tree_mode == "full"  # 32 shards < MIN_SHARDS
    # lower the threshold -> the same writer goes incremental
    monkeypatch.setattr(BloomIndexWriter, "TREE_INCREMENTAL_MIN_SHARDS", 1)
    w.build(df, path, resume=True)
    assert w._last_tree_mode == "incremental"
    # "full" policy ignores the dirty set even under the low threshold
    wf = BloomIndexWriter(spark, _cfg(), tree_refresh="full")
    wf.build(touched, path, resume=True)
    assert wf._last_tree_mode == "full"
    with pytest.raises(ValueError, match="tree_refresh"):
        BloomIndexWriter(spark, _cfg(), tree_refresh="sometimes")


def test_large_dirty_set_falls_back_to_full(spark, tmp_path):
    """Past TREE_INCREMENTAL_MAX_FRAC of the shards, the full rebuild is
    cheaper AND sharper — the writer must take it (even when the policy
    FORCES incremental: the fraction gate is about correctness-adjacent
    sharpness, not just cost, so it binds every policy)."""
    path = str(tmp_path / "idx")
    df = synthesize_transcripts(spark, 1500, seed=29)
    w = BloomIndexWriter(spark, _cfg(), tree_refresh="incremental")
    w.build(df, path)
    # touch every row -> every shard dirty
    w.build(df.withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzall"))),
        path, resume=True)
    assert w._last_tree_mode == "full"


def test_removed_shards_refresh_incrementally(spark, tmp_path):
    """A resume that only REMOVES shards (their rows vanished from the
    source) refreshes the tree incrementally: the emptied shards leave
    the descent, survivors keep matching."""
    path = str(tmp_path / "idx")
    df = synthesize_transcripts(spark, 2000, seed=31)
    shard_of = F.pmod(F.xxhash64("conv_id"), F.lit(N_SHARDS)).cast("int")
    w = BloomIndexWriter(spark, _cfg(), tree_refresh="incremental")
    w.build(df, path)
    survivors = df.where(shard_of != 7)
    stats = w.build(survivors, path, resume=True)
    assert stats["removed"] == 1 and stats["built"] == 0
    assert w._last_tree_mode == "incremental"
    r = BloomIndexReader(spark, path)
    queries = {"common": r.transcript_query_tokens(None, None,
                                                   ["w00001"])}
    tree = r.prune_shards_many_distributed(queries, use_tree=True)
    flat = r.prune_shards_many_distributed(queries, use_tree=False)
    assert 7 not in tree["common"] and 7 not in flat["common"]
    assert set(tree["common"]) <= set(flat["common"])
    # ground truth on the surviving rows only
    truth = {int(x.shard) for x in survivors.withColumn(
        "shard", shard_of).where(
        F.array_contains(F.split(F.trim("text"), r"\s+"), "w00001"))
        .select("shard").distinct().collect()}
    assert truth <= set(tree["common"])
