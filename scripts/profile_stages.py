"""Per-stage scaling profile: time each build stage at local[N] and
local[4N] on the identical input to locate the non-scaling component.

Usage: python scripts/profile_stages.py [n_turns] [N]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 8

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.session import get_spark
from mdbloom.spark.transcripts import synthesize_transcripts

cores = int(sys.argv[1]); n_turns = int(sys.argv[2])
spark = get_spark(f"prof{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
idx = f"/tmp/mdbloom_prof_{cores}"
# keyed by size: a cached corpus from a different-n run must
# never be silently reused (same rule as scaling_bench)
src = f"/tmp/mdbloom_prof_src_{n_turns}"
shutil.rmtree(idx, ignore_errors=True)
os.makedirs(idx, exist_ok=True)
# 256 shards: match the scaling_bench protocol layout so stage timings
# attribute the same end-to-end build the N-vs-4N pairs measure
cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=256,
                  chunk_slots=65536)
if not os.path.exists(src + "/_SUCCESS"):
    synthesize_transcripts(spark, n_turns, seed=42, n_partitions=128) \
        .write.mode("overwrite").parquet(src)
tdf = spark.read.parquet(src)
w = BloomIndexWriter(spark, cfg)
stages = {}

def t(name, fn):
    t0 = time.monotonic(); r = fn(); stages[name] = time.monotonic() - t0
    return r

fp = t("fingerprints_toPandas", lambda: w.fingerprints(tdf).toPandas())
# mirror build()'s fused v2 flow: the jvm backend repartitions internally
# (its wide exchange happens pre-aggregation on raw records); the hash
# pass streams straight into the partitioned storage write (no persist)
filters = w.filters_df(tdf)
if cfg.hash_backend != "jvm":
    filters = filters.repartition(cfg.n_shards, "shard")
t("hash_storage_write", lambda: (filters
    .select("shard", "key", *cfg.id_columns, "filter")
    .write.mode("overwrite").partitionBy("shard")
    .parquet(os.path.join(idx, "storage"))))
from mdbloom.spark.build import SLAB_SCHEMA, MANIFEST_SCHEMA
stored = spark.read.parquet(os.path.join(idx, "storage")) \
    .select("shard", "key", "filter")
t("slab_write", lambda: (stored
    .mapInPandas(w._slab_mapper(), schema=SLAB_SCHEMA)
    .write.mode("overwrite").partitionBy("shard")
    .parquet(os.path.join(idx, "slabs"))))
t("token_stream", lambda: w._write_token_hashes(
    w._token_stream_df(tdf), idx))
t("token_gate", lambda: w.token_gate_df(
    spark.read.parquet(os.path.join(idx, "token_hashes"))).count())
slabs_rd = spark.read.parquet(os.path.join(idx, "slabs"))
t("manifest_agg", lambda: (slabs_rd.groupBy("shard")
    .applyInPandas(w._manifest_udf(), schema=MANIFEST_SCHEMA).count()))
stages["total"] = sum(stages.values())
print("RESULT " + json.dumps({"cores": cores, "stages": stages}))
"""


def treatment_env() -> dict:
    """Fault-path mitigation env (same as scaling_bench.run): pre-touched
    JVM heap + reusable malloc/Arrow arenas, see BENCH.md."""
    env = dict(os.environ)
    if os.environ.get("MDBLOOM_SCALE_PRETOUCH", "1") == "1":
        env.update({
            "MDBLOOM_JVM_PRETOUCH": "1",
            "MALLOC_MMAP_THRESHOLD_": "17179869184",
            "MALLOC_TRIM_THRESHOLD_": "17179869184",
            "ARROW_DEFAULT_MEMORY_POOL": "system",
        })
    return env


def run(cores: int) -> dict:
    # pin the whole session (JVM + python workers) to exactly `cores` CPUs:
    # without affinity, a local[8] JVM plus its 8 python workers can use up
    # to 16 of the machine's cores, which silently flatters the low end of
    # the N-vs-4N comparison
    out = subprocess.run(["taskset", "-c", f"0-{cores - 1}", sys.executable,
                          "-c", WORKER, str(cores), str(N_TURNS)],
                         capture_output=True, text=True, env=treatment_env(),
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(out.stdout[-3000:], file=sys.stderr)
    print(out.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"no RESULT at local[{cores}]")


if __name__ == "__main__":
    lo = run(N_LOW)
    hi = run(N_LOW * 4)
    print(f"{'stage':32s} {'lo':>8s} {'hi':>8s} {'speedup':>8s} {'eff':>6s}")
    for k in lo["stages"]:
        a, b = lo["stages"][k], hi["stages"][k]
        sp = a / b if b else float("inf")
        print(f"{k:32s} {a:8.2f} {b:8.2f} {sp:8.2f} {sp/4:6.2f}")
