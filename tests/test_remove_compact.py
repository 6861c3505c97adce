"""Distributed remove (append-only tombstones) + compaction — the scale
re-expression of `ContainerImpl.remove` (`ContainerImpl.java:134-153`,
designed per SURVEY §7 hard part (b))."""

import pytest
from pyspark.sql import functions as F

from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.transcripts import synthesize_transcripts


@pytest.fixture()
def setup(spark, tmp_path):
    path = str(tmp_path / "idx")
    df = synthesize_transcripts(spark, 1200, seed=42).cache()
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=4,
                      chunk_slots=256)
    w = BloomIndexWriter(spark, cfg)
    w.build(df, path)
    return spark, df, w, path


def test_remove_hides_rows_and_compact_rebuilds(setup):
    spark, df, w, path = setup
    r = BloomIndexReader(spark, path)
    total = r.value_count()
    victims = df.where(F.col("role") == "system").select("conv_id",
                                                         "turn_idx")
    n_dead = victims.count()
    assert n_dead > 0

    removed = w.remove(victims, path)
    assert removed == n_dead

    # tombstoned rows vanish from search and counts immediately
    r2 = BloomIndexReader(spark, path)
    assert r2.value_count() == total - n_dead
    hits = r2.search([]).toPandas()  # empty query = all values
    got = set(map(tuple, hits[["conv_id", "turn_idx"]]
                  .itertuples(index=False)))
    dead = set(map(tuple, victims.toPandas().itertuples(index=False)))
    assert got.isdisjoint(dead)
    assert len(got) == total - n_dead

    # verified search still exact after deletes
    toks = r2.transcript_query_tokens("system", None, [])
    assert r2.search_verified(toks, df.join(
        victims, ["conv_id", "turn_idx"], "left_anti")).count() == 0

    # compaction rebuilds only affected shards and drops tombstones
    alive_src = df.join(victims, ["conv_id", "turn_idx"], "left_anti")
    stats = w.compact(df, path)
    assert stats["built"] >= 1
    import os
    assert not os.path.exists(os.path.join(path, "tombstones"))
    r3 = BloomIndexReader(spark, path)
    assert r3.value_count() == total - n_dead
    assert r3.storage().count() == total - n_dead
    # post-compaction result identical to a fresh build on surviving rows
    fresh = str(path) + "_fresh"
    w.build(alive_src, fresh)
    rf = BloomIndexReader(spark, fresh)
    q = r3.transcript_query_tokens("assistant", None, ["w00001"])
    a = set(map(tuple, r3.search(q).select("conv_id", "turn_idx")
                .toPandas().itertuples(index=False)))
    b = set(map(tuple, rf.search(q).select("conv_id", "turn_idx")
                .toPandas().itertuples(index=False)))
    assert a == b


def test_metrics_dataframe(setup):
    spark, df, w, path = setup
    r = BloomIndexReader(spark, path)
    m = r.metrics().toPandas()
    assert len(m) == 4  # one row per shard
    assert (m["n_turns"] > 0).all()
    assert (m["build_ms"] > 0).all()
    assert m["n_turns"].sum() == 1200 or m["n_turns"].sum() == df.count()
