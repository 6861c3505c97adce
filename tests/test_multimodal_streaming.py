"""Multimodal plumbing (stubbed codecs, real Spark batching) and the
Structured Streaming sketch surface."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mdbloom.sketches import HllSketch
from mdbloom.spark import multimodal as M
from mdbloom.spark.streaming import StreamingSketch, windowed_counts


# ---------------- multimodal ----------------

def test_media_table_deterministic(spark):
    a = M.synthesize_media(spark, 64).orderBy("media_id").toPandas()
    b = M.synthesize_media(spark, 64).orderBy("media_id").toPandas()
    assert (a["payload"] == b["payload"]).all()
    assert set(a["kind"]) == {"image", "audio", "video"}


def test_extract_features_plumbing(spark):
    media = M.synthesize_media(spark, 96)
    feats = M.extract_features(media, decoder=M.fake_decoder,
                               feat_dim=8, sample_every=10).toPandas()
    assert len(feats) == 96
    assert feats["feature"].map(len).eq(8).all()
    assert (feats["channels"].between(1, 3)).all()
    # video frame sampling arithmetic: sampled = max(1, n_frames // 10)
    vids = feats[feats["kind"] == "video"]
    assert (vids["n_frames"] >= 1).all()
    imgs = feats[feats["kind"] == "image"]
    assert (imgs["n_frames"] == 1).all()
    # deterministic features
    again = M.extract_features(media, decoder=M.fake_decoder).toPandas()
    f1 = feats.sort_values("media_id")["feature"].map(tuple).tolist()
    f2 = again.sort_values("media_id")["feature"].map(tuple).tolist()
    assert f1 == f2


def test_decode_stub_raises_clearly(spark):
    media = M.synthesize_media(spark, 4)
    with pytest.raises(Exception) as ei:
        M.extract_features(media).collect()  # no decoder injected
    assert "NotImplementedError" in str(ei.value) or \
        "no image codec" in str(ei.value)


# ---------------- streaming ----------------

def test_streaming_sketch_matches_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)
    schema = events.schema

    stream = spark.readStream.schema(schema).parquet(src)
    acc = StreamingSketch(lambda: HllSketch(13), HllSketch.from_bytes,
                          col="user_id")
    q = acc.start(stream)
    q.awaitTermination(120)
    assert acc.batches_seen >= 1

    batch_est = HllSketch(13).update(
        events.select("user_id").toPandas()["user_id"].to_numpy()).estimate()
    assert acc.sketch.estimate() == batch_est  # same registers either way


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_counts(stream, "ts", "event_type", window="1 hour")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("wcounts").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select sum(n) as total from wcounts").collect()[0].total
    assert got == events.count()
    # per-key totals match a batch groupBy
    got_k = {(r.event_type): r.s for r in spark.sql(
        "select event_type, sum(n) as s from wcounts group by 1").collect()}
    want_k = {r.event_type: r.s for r in events.groupBy("event_type")
              .agg(F.count("*").alias("s")).collect()}
    assert got_k == want_k
