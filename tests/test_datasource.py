"""spark.read.format("mdbloom") — the Python Data Source surface must
return exactly the reader's live storage rows, with containment and
shard/key pushdown honored inside the source."""

import pytest
from pyspark.sql import functions as F

from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.datasource import MdbloomDataSource, MdbloomReader
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.transcripts import synthesize_transcripts


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(MdbloomDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


@pytest.fixture(scope="module")
def idx_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dsidx") / "index")
    df = synthesize_transcripts(spark, 1500, seed=42)
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=4,
                      chunk_slots=256)
    BloomIndexWriter(spark, cfg).build(df, path)
    return path


def _ids(pdf):
    return set(map(tuple, pdf[["conv_id", "turn_idx"]]
                   .itertuples(index=False)))


def test_plain_load_equals_storage(spark, idx_path):
    got = spark.read.format("mdbloom").option("path", idx_path).load()
    assert "filter" not in got.columns
    want = BloomIndexReader(spark, idx_path).storage().toPandas()
    assert _ids(got.toPandas()) == _ids(want)
    assert got.count() == len(want)


def test_tokens_option_equals_search(spark, idx_path):
    reader = BloomIndexReader(spark, idx_path)
    toks = reader.transcript_query_tokens("assistant", None, ["w00001"])
    got = (spark.read.format("mdbloom").option("path", idx_path)
           .option("tokens", ",".join(toks)).load()).toPandas()
    want = reader.search(toks).toPandas()
    assert _ids(got) == _ids(want) and len(got) > 0


def test_absent_tokens_yield_no_rows(spark, idx_path):
    got = (spark.read.format("mdbloom").option("path", idx_path)
           .option("tokens", "tok=zzznope,tok=zzznope2").load())
    assert got.count() == 0


def test_shard_pushdown_prunes_partitions(spark, idx_path):
    got = (spark.read.format("mdbloom").option("path", idx_path).load()
           .where(F.col("shard") == 2)).toPandas()
    want = BloomIndexReader(spark, idx_path).storage() \
        .where(F.col("shard") == 2).toPandas()
    assert _ids(got) == _ids(want) and len(got) > 0
    # the filter is consumed by the source: partitions() plans one shard
    r = MdbloomReader({"path": idx_path}, spark.read.format("mdbloom")
                      .option("path", idx_path).load().schema)
    from pyspark.sql.datasource import EqualTo
    rest = list(r.pushFilters([EqualTo(("shard",), 2)]))
    assert rest == []
    assert [p.value for p in r.partitions()] == [2]


def test_key_equality_pushdown(spark, idx_path):
    reader = BloomIndexReader(spark, idx_path)
    row = reader.storage().select("shard", "key").head(1)[0]
    got = (spark.read.format("mdbloom").option("path", idx_path).load()
           .where(F.col("key") == row.key)).toPandas()
    want = reader.storage().where(F.col("key") == row.key).toPandas()
    assert len(got) == len(want) > 0
    assert set(got["key"]) == {row.key}


def test_include_filter_and_tombstones(spark, tmp_path):
    path = str(tmp_path / "index")
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=2,
                      chunk_slots=64)
    df = synthesize_transcripts(spark, 200, seed=7)
    w = BloomIndexWriter(spark, cfg)
    w.build(df, path)
    victim = df.orderBy("conv_id", "turn_idx").head(1)[0]
    w.remove(
        df.where((F.col("conv_id") == victim.conv_id)
                 & (F.col("turn_idx") == victim.turn_idx)), path)
    got = (spark.read.format("mdbloom").option("path", path)
           .option("include_filter", "true").load())
    assert "filter" in got.columns
    pdf = got.toPandas()
    assert (victim.conv_id, victim.turn_idx) not in _ids(pdf)
    want = BloomIndexReader(spark, path).storage().toPandas()
    assert _ids(pdf) == _ids(want)


def test_write_sink_overwrite_append_roundtrip(spark, tmp_path):
    import os
    path = str(tmp_path / "sidx")
    df = synthesize_transcripts(spark, 300, seed=11)
    (df.write.format("mdbloom").mode("overwrite").option("path", path)
       .option("n_shards", "2").option("chunk_slots", "64").save())
    # commit is Spark-free: rows land in pending/, no index built yet —
    # reads still see everything via the bit-identical tail mirrors
    assert os.path.isdir(os.path.join(path, "pending"))
    assert not os.path.isdir(os.path.join(path, "storage"))
    got = spark.read.format("mdbloom").option("path", path).load()
    assert _ids(got.toPandas()) == _ids(df.toPandas())
    # append brand-new conversations: old + new all visible pre-fold
    extra = synthesize_transcripts(spark, 60, seed=12).withColumn(
        "conv_id", F.concat(F.lit("x_"), F.col("conv_id")))
    extra.write.format("mdbloom").mode("append").option("path", path) \
        .save()
    got2 = spark.read.format("mdbloom").option("path", path).load() \
        .toPandas()
    assert _ids(got2) == _ids(df.toPandas()) | _ids(extra.toPandas())
    # token containment on the UNFOLDED tail...
    toks = ["role=user", "tok=w00000"]
    pre_fold = (spark.read.format("mdbloom").option("path", path)
                .option("tokens", ",".join(toks)).load()).toPandas()
    # ...engine open folds the pending rows in (distributed build)
    r = BloomIndexReader(spark, path)
    assert os.listdir(os.path.join(path, "pending")) == []
    assert r.value_count() == len(got2)
    # the tail's filters were bit-identical: pre-fold == post-fold
    want = r.search(toks).toPandas()
    via_ds = (spark.read.format("mdbloom").option("path", path)
              .option("tokens", ",".join(toks)).load()).toPandas()
    assert _ids(via_ds) == _ids(want)
    assert _ids(pre_fold) == _ids(want)
    # a mixed state folds too: append again onto the folded index
    more = synthesize_transcripts(spark, 30, seed=13).withColumn(
        "conv_id", F.concat(F.lit("y_"), F.col("conv_id")))
    more.write.format("mdbloom").mode("append").option("path", path) \
        .save()
    got3 = spark.read.format("mdbloom").option("path", path).load() \
        .toPandas()
    assert _ids(got3) == _ids(got2) | _ids(more.toPandas())
    assert BloomIndexReader(spark, path).value_count() == len(got3)


def test_stream_sink_ingest_then_fold(spark, tmp_path):
    import os
    path = str(tmp_path / "stidx")
    src = str(tmp_path / "ssrc")
    df = synthesize_transcripts(spark, 120, seed=21)
    df.repartition(3).write.parquet(src)
    q = (spark.readStream.schema(df.schema)
         .option("maxFilesPerTrigger", "1").parquet(src)
         .writeStream.format("mdbloom").option("path", path)
         .option("n_shards", "2").option("chunk_slots", "64")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # several microbatches promoted to pending/ — readable pre-fold
    assert len(os.listdir(os.path.join(path, "pending"))) >= 2
    got = spark.read.format("mdbloom").option("path", path).load() \
        .toPandas()
    assert _ids(got) == _ids(df.toPandas())
    # engine open folds the whole tail into index shards
    r = BloomIndexReader(spark, path)
    assert os.listdir(os.path.join(path, "pending")) == []
    assert r.value_count() == len(got)
    toks = r.transcript_query_tokens("assistant", None, ["w00002"])
    assert _ids(r.search(toks).toPandas()) == _ids(
        (spark.read.format("mdbloom").option("path", path)
         .option("tokens", ",".join(toks)).load()).toPandas())


def test_fold_crash_heal_no_duplicates(spark, tmp_path):
    """A fold that dies between the copy-to-source and the pending
    cleanup leaves the same file in both dirs; the retried fold must
    promote identical bytes idempotently (same name, tmp+rename) and
    end with each row indexed exactly once."""
    import os
    import shutil

    from mdbloom.spark.build import fold_pending
    path = str(tmp_path / "cidx")
    df = synthesize_transcripts(spark, 80, seed=7)
    (df.write.format("mdbloom").mode("overwrite").option("path", path)
       .option("n_shards", "2").option("chunk_slots", "64").save())
    pend = os.path.join(path, "pending")
    src = os.path.join(path, "source")
    os.makedirs(src, exist_ok=True)
    f = sorted(os.listdir(pend))[0]
    shutil.copyfile(os.path.join(pend, f), os.path.join(src, f))
    stats = fold_pending(spark, path)  # the "retry"
    assert stats["folded_files"] >= 1
    assert os.listdir(pend) == []
    r = BloomIndexReader(spark, path)
    assert r.value_count() == df.count()
    assert _ids(r.storage().toPandas()) == _ids(df.toPandas())


def test_shards_of_matches_spark(spark):
    from mdbloom.spark.datasource import _shards_of
    df = spark.range(0, 500).select(
        F.col("id").alias("i64"),
        F.col("id").cast("int").alias("i32"),
        F.concat(F.lit("c"), F.col("id")).alias("s"))
    pdf = df.toPandas()
    for c in ("i64", "i32", "s"):
        want = df.select(F.pmod(F.xxhash64(c), F.lit(7)).cast("int")
                         .alias("sh")).toPandas()["sh"].to_numpy()
        cfg = IndexConfig(n_shards=7, id_columns=(c,))
        got = _shards_of(pdf, cfg)
        assert (want == got).all(), c
    # multi-column chain (explicit skew control): Spark chains xxhash64
    # across columns with the running hash as seed — the mirror must
    # reproduce string+integral chains bit-exactly
    for cols in (("s", "i64"), ("i64", "s"), ("s", "i32"),
                 ("s", "i64", "i32")):
        want = df.select(
            F.pmod(F.xxhash64(*cols), F.lit(7)).cast("int")
            .alias("sh")).toPandas()["sh"].to_numpy()
        cfg = IndexConfig(n_shards=7, id_columns=cols,
                          shard_columns=cols)
        got = _shards_of(pdf, cfg)
        assert (want == got).all(), cols


def test_append_to_foreign_index_rejected(spark, tmp_path):
    path = str(tmp_path / "fidx")
    df = synthesize_transcripts(spark, 100, seed=3)
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=2,
                      chunk_slots=64)
    BloomIndexWriter(spark, cfg).build(df, path)  # no source/ dir
    with pytest.raises(Exception, match="source"):
        df.write.format("mdbloom").mode("append").option("path", path) \
            .save()
