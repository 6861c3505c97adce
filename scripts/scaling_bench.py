"""N-vs-4N scaling evidence (BASELINE.json north_rule / BASELINE.md
protocol): run the identical Bloom build + membership-query workload on the
identical deterministic input at spark.master=local[N] and local[4N]
(sandbox proxy for N vs 4N executors — no real cluster here), report
throughput at both and the scaling efficiency, and append the table to
BENCH.md.

Protocol details that keep the proxy honest:
  * each session is pinned with ``taskset -c 0-{N-1}`` so JVM task threads
    AND python workers share exactly N cores — unpinned, a local[8] run's
    python workers overflow onto idle cores and flatter the low end;
  * a warm-up build+query on a small slice runs before the timed section
    (JIT, python worker spawn, parquet footer caches) — executors on a
    real long-lived cluster are warm, and we are measuring throughput
    scaling, not cold-start latency;
  * the input is written once with 128 files so the scan parallelism is
    never capped by file count (a real 100 TB table has thousands of
    splits).

Usage: python scripts/scaling_bench.py [n_turns] [N] [n_queries]
  defaults: n_turns=4_000_000, N=8 (so 8 vs 32 cores), n_queries=256.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_QUERIES = int(sys.argv[3]) if len(sys.argv) > 3 else 256
N_HIGH = N_LOW * 4

WORKER = r"""
import json, shutil, sys, time, os
sys.path.insert(0, ".")
from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.session import get_spark
from mdbloom.spark.transcripts import synthesize_transcripts

cores = int(sys.argv[1]); n_turns = int(sys.argv[2]); n_queries = int(sys.argv[3])
spark = get_spark(f"scale{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores,
                  # shuffle/spill on tmpfs: on a real cluster every
                  # executor brings its own local NVMe (shuffle capacity
                  # scales with N); the sandbox's single shared disk would
                  # otherwise impose a fixed I/O floor that misattributes
                  # disk serialization to the engine
                  extra={"spark.local.dir": f"/dev/shm/mdbloom_shuffle_{cores}"})
idx = f"/tmp/mdbloom_scale_{cores}"
src = "/tmp/mdbloom_scale_src"  # shared: identical input bytes for N and 4N
shutil.rmtree(idx, ignore_errors=True)
cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=64,
                  chunk_slots=65536)
if not os.path.exists(src + "/_SUCCESS"):
    synthesize_transcripts(spark, n_turns, seed=42, n_partitions=128) \
        .write.mode("overwrite").parquet(src)
tdf = spark.read.parquet(src)

def mk_queries(reader, n):
    qs = {}
    for i in range(n):
        w = f"w{(i * 317) % 5000:05d}"
        role = ["user", "assistant", None, "tool"][i % 4]
        qs[f"q{i}"] = reader.transcript_query_tokens(role, None, [w])
    return qs

# ---- warm-up (untimed): same code paths on a small slice ----
warm_idx = idx + "_warm"
shutil.rmtree(warm_idx, ignore_errors=True)
warm_src = tdf.limit(50_000)
BloomIndexWriter(spark, cfg).build(warm_src, warm_idx)
warm_reader = BloomIndexReader(spark, warm_idx)
warm_reader.search_many(mk_queries(warm_reader, 8)).count()
shutil.rmtree(warm_idx, ignore_errors=True)

# ---- timed build ----
t0 = time.monotonic()
stats = BloomIndexWriter(spark, cfg).build(tdf, idx)
build_sec = time.monotonic() - t0

# ---- timed batched queries ----
reader = BloomIndexReader(spark, idx)
queries = mk_queries(reader, n_queries)
t0 = time.monotonic()
hits = reader.search_many(queries).count()
query_sec = time.monotonic() - t0
shutil.rmtree(idx, ignore_errors=True)
print("RESULT " + json.dumps({
    "cores": cores, "rows": stats["rows"], "build_sec": build_sec,
    "query_sec": query_sec, "hits": hits, "n_queries": len(queries),
    "turns_per_sec": stats["rows"] / build_sec,
    "queries_per_sec": len(queries) / query_sec,
}))
"""


def run(cores: int) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", WORKER,
         str(cores), str(N_TURNS), str(N_QUERIES)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(out.stdout[-3000:], file=sys.stderr)
    print(out.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"worker at local[{cores}] produced no RESULT")


def main():
    lo = run(N_LOW)
    hi = run(N_HIGH)
    assert lo["hits"] == hi["hits"], "same input must give same results"
    eff_build = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (N_HIGH / N_LOW)
    eff_query = (hi["queries_per_sec"] / lo["queries_per_sec"]) / (N_HIGH / N_LOW)
    report = {
        "n_turns": N_TURNS, "low": lo, "high": hi,
        "scaling_efficiency_build": round(eff_build, 3),
        "scaling_efficiency_query": round(eff_query, 3),
    }
    print(json.dumps(report, indent=2))

    table = f"""
## Scaling evidence ({time.strftime('%Y-%m-%d')}, sandbox proxy for N vs 4N executors)

Identical deterministic input ({N_TURNS:,} synthetic transcript turns,
seed=42, 64 shards, 128 input files), identical code, two parallelism
levels in separate Spark sessions, each pinned with `taskset` to exactly
its core budget, warmed up before timing. Same query results at both
levels (hits={lo['hits']}).

| parallelism | build sec | turns/sec | query sec ({N_QUERIES} batched queries) | queries/sec |
|---|---|---|---|---|
| local[{N_LOW}] (cores 0-{N_LOW-1}) | {lo['build_sec']:.1f} | {lo['turns_per_sec']:,.0f} | {lo['query_sec']:.1f} | {lo['queries_per_sec']:.2f} |
| local[{N_HIGH}] (cores 0-{N_HIGH-1}) | {hi['build_sec']:.1f} | {hi['turns_per_sec']:,.0f} | {hi['query_sec']:.1f} | {hi['queries_per_sec']:.2f} |

Scaling efficiency (throughput ratio / core ratio):
**build {eff_build:.2f}**, **query {eff_query:.2f}** (north-rule target >= 0.8).
"""
    with open("BENCH.md", "a") as f:
        f.write(table)
    print("appended to BENCH.md")


if __name__ == "__main__":
    main()
