"""Explicit skew control: IndexConfig.shard_columns.

The default shard key (first id column = conv_id) co-locates every turn
of a conversation, which is skew-free only while conversation sizes are
bounded — one 10^7-turn agent run would make its shard hot. The north
rule demands skew be "handled explicitly": shard_columns widens the
shard hash to more id columns (chained xxhash64, the Spark semantics),
spreading rows uniformly with NO correctness impact — search, gate,
manifest, get and remove semantics never depend on WHICH shard a row
lives in (each shard's artifacts describe its actual contents), and
remove/compact read shards from storage rather than recomputing them.

Contracts verified here:
  * a heavy-tailed corpus (80% of turns in one conversation) produces a
    hot shard under the default key and a balanced layout under
    shard_columns=id_columns;
  * the two indexes return IDENTICAL verified search results and exact
    gets (physical placement is invisible to query semantics);
  * config: validation rejects non-id shard columns; to_json emits the
    field only when non-default (hash/resume stability for every
    pre-existing index) and round-trips it when set.
"""
import json

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.transcripts import synthesize_transcripts

N_SHARDS = 16


def _heavy_tailed(spark):
    """~80% of turns collapsed into one conversation (turn_idx
    re-enumerated to keep (conv_id, turn_idx) a unique identity)."""
    df = synthesize_transcripts(spark, 1500, seed=41)
    hot = F.pmod(F.xxhash64("conv_id"), F.lit(5)) != 0
    merged = df.withColumn(
        "conv_id", F.when(hot, F.lit("hotconv")).otherwise(F.col("conv_id")))
    win = Window.partitionBy("conv_id").orderBy("turn_idx", "ts", "text")
    return (merged.withColumn(
        "turn_idx", F.row_number().over(win).cast("int"))
        .select(*df.columns))


def _cfg(**kw):
    return IndexConfig(n_per_record=40, probability=1e-3,
                       n_shards=N_SHARDS, chunk_slots=256, **kw)


@pytest.fixture(scope="module")
def skew_setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("skew")
    df = _heavy_tailed(spark)
    paths = {"default": str(base / "default"), "salted": str(base / "salted")}
    BloomIndexWriter(spark, _cfg()).build(df, paths["default"])
    BloomIndexWriter(spark, _cfg(
        shard_columns=("conv_id", "turn_idx"))).build(df, paths["salted"])
    return {"df": df, **paths}


def test_default_key_hot_salted_balanced(spark, skew_setup):
    n = skew_setup["df"].count()

    def frac_max(path):
        counts = (BloomIndexReader(spark, path).storage()
                  .groupBy("shard").count().toPandas())
        return counts["count"].max() / n, len(counts)

    hot_frac, _ = frac_max(skew_setup["default"])
    bal_frac, bal_shards = frac_max(skew_setup["salted"])
    assert hot_frac >= 0.8  # all of hotconv in one shard
    assert bal_shards == N_SHARDS
    # uniform hash over ~1500 rows / 16 shards: max well under the hot frac
    assert bal_frac < 0.2


def test_search_results_identical_across_shard_keys(spark, skew_setup):
    d = BloomIndexReader(spark, skew_setup["default"])
    s = BloomIndexReader(spark, skew_setup["salted"])
    queries = {
        "a": d.transcript_query_tokens("assistant", None, ["w00001"]),
        "b": d.transcript_query_tokens("user", None, ["w00002", "w00003"]),
        "none": ["tok=zzqnothere"],
    }

    def ids(reader):
        hits = reader.search_verified_many(queries, skew_setup["df"])
        return {tuple(r) for r in hits.select(
            "query", "conv_id", "turn_idx").collect()}

    assert ids(d) == ids(s)


def test_exact_get_on_salted_index(spark, skew_setup):
    df = skew_setup["df"]
    row = (df.where(F.col("conv_id") == "hotconv")
           .orderBy("turn_idx").first())
    r = BloomIndexReader(spark, skew_setup["salted"])
    toks = r.transcript_query_tokens(
        row["role"],
        None if row["tool"] in (None, "none") else row["tool"],
        row["text"].split())
    got = r.get(toks).select("conv_id", "turn_idx").collect()
    assert (row["conv_id"], row["turn_idx"]) in {
        (x.conv_id, x.turn_idx) for x in got}


def test_config_validation_and_json_stability():
    with pytest.raises(ValueError, match="shard_columns"):
        _cfg(shard_columns=("nope",))
    # default: no key emitted -> every pre-existing config.json / fixture
    # cache key keeps its exact bytes
    assert "shard_columns" not in json.loads(_cfg().to_json())
    cfg = _cfg(shard_columns=("conv_id", "turn_idx"))
    rt = IndexConfig.from_json(cfg.to_json())
    assert rt.shard_columns == ("conv_id", "turn_idx")
    assert rt.to_json() == cfg.to_json()
    assert _cfg().shard_cols == ("conv_id",)
    assert cfg.shard_cols == ("conv_id", "turn_idx")
