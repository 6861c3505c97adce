"""Per-stage build timing at a given parallelism (scaling diagnosis).
Usage: python scripts/profile_build.py <cores> [n_turns]"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1])
n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

from pyspark.sql import functions as F

from mdbloom.spark.build import SLAB_SCHEMA, BloomIndexWriter, IndexConfig
from mdbloom.spark.session import get_spark
from mdbloom.spark.transcripts import synthesize_transcripts

spark = get_spark(f"prof{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
src = "/tmp/profile_build_src"
if not os.path.exists(src + "/_SUCCESS"):
    synthesize_transcripts(spark, n_turns, seed=42, n_partitions=128) \
        .write.mode("overwrite").parquet(src)
tdf = spark.read.parquet(src)
cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=64,
                  chunk_slots=65536)
w = BloomIndexWriter(spark, cfg)
out = f"/tmp/profile_build_idx_{cores}"
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)

T = {}
def t(name, fn):
    t0 = time.monotonic()
    r = fn()
    T[name] = round(time.monotonic() - t0, 2)
    print(name, T[name], flush=True)
    return r

t("fingerprints", lambda: w.fingerprints(tdf).toPandas())
filters = w.filters_df(tdf).repartition(cfg.n_shards, "shard").persist()
t("hash+persist", lambda: filters.count())
t("storage_write", lambda: filters.select("shard", "key", *cfg.id_columns)
  .write.mode("overwrite").partitionBy("shard").parquet(out + "/storage"))
kf = filters.select("shard", "key", "filter")
t("slotmap", lambda: kf.groupBy("shard")
  .applyInPandas(w._slotmap_udf(), schema="shard int, slot long, key string")
  .write.mode("overwrite").partitionBy("shard").parquet(out + "/slotmap"))
t("slabs", lambda: kf.groupBy("shard")
  .applyInPandas(w._slab_udf(), schema=SLAB_SCHEMA)
  .write.mode("overwrite").partitionBy("shard").parquet(out + "/slabs"))
filters.unpersist()
t("token_gate", lambda: w.token_gate_df(tdf).count())
slabs_rd = spark.read.parquet(out + "/slabs")
from mdbloom.spark.build import MANIFEST_SCHEMA
t("manifest_agg", lambda: slabs_rd.groupBy("shard")
  .applyInPandas(w._manifest_udf(), schema=MANIFEST_SCHEMA).count())
print("TOTAL", round(sum(T.values()), 2))
shutil.rmtree(out, ignore_errors=True)
