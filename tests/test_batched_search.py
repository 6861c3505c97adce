"""Batched multi-query search must return exactly the union of per-query
searches, tagged by query name."""

import pytest

from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bidx") / "index")
    df = synthesize_transcripts(spark, 1500, seed=42)
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=4,
                      chunk_slots=256)
    BloomIndexWriter(spark, cfg).build(df, path)
    return BloomIndexReader(spark, path)


def test_search_many_matches_individual_searches(spark, reader):
    queries = {
        "a": reader.transcript_query_tokens("assistant", None, ["w00001"]),
        "b": reader.transcript_query_tokens(None, "Bash", ["w00005"]),
        "c": reader.transcript_query_tokens("user", None, ["w00000",
                                                           "w00002"]),
        "absent": ["tok=zzznope"],
    }
    batched = reader.search_many(queries).toPandas()
    for name, toks in queries.items():
        single = reader.search(toks).toPandas()
        got = set(map(tuple, batched[batched["query"] == name]
                      [["conv_id", "turn_idx"]].itertuples(index=False)))
        want = set(map(tuple, single[["conv_id", "turn_idx"]]
                       .itertuples(index=False)))
        assert got == want, name
    assert (batched["query"] == "absent").sum() == 0


def test_search_many_empty_query_matches_all(spark, reader):
    out = reader.search_many({"every": [], "none": ["tok=zzznope"]}) \
        .toPandas()
    assert (out["query"] == "every").sum() == reader.value_count()
    assert (out["query"] == "none").sum() == 0
