"""N-vs-4N scaling evidence (BASELINE.json north_rule / BASELINE.md
protocol): run the identical Bloom build + membership-query workload on the
identical deterministic input at spark.master=local[N] and local[4N]
(sandbox proxy for N vs 4N executors — no real cluster here), report
throughput at both and the scaling efficiency, and append the table to
BENCH.md.

Usage: python scripts/scaling_bench.py [n_turns] [N]
  defaults: n_turns=1_000_000, N=8 (so 8 vs 32 cores).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_HIGH = N_LOW * 4

WORKER = r"""
import json, shutil, sys, time
sys.path.insert(0, ".")
from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.session import get_spark
from mdbloom.spark.transcripts import synthesize_transcripts

cores = int(sys.argv[1]); n_turns = int(sys.argv[2])
spark = get_spark(f"scale{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
idx = f"/tmp/mdbloom_scale_{cores}"
src = "/tmp/mdbloom_scale_src"  # shared: identical input bytes for N and 4N
shutil.rmtree(idx, ignore_errors=True)
cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=64,
                  chunk_slots=65536)
import os
if not os.path.exists(src + "/_SUCCESS"):
    # 128 files: a realistically-partitioned stored table (a low file count
    # would cap the narrow hash pass at n_files tasks and fake an Amdahl
    # bottleneck the real 100TB layout doesn't have)
    synthesize_transcripts(spark, n_turns, seed=42, n_partitions=128) \
        .write.mode("overwrite").parquet(src)
tdf = spark.read.parquet(src)

t0 = time.monotonic()
stats = BloomIndexWriter(spark, cfg).build(tdf, idx)
build_sec = time.monotonic() - t0

reader = BloomIndexReader(spark, idx)
queries = {}
for i in range(64):
    w = f"w{(i * 317) % 5000:05d}"
    role = ["user", "assistant", None, "tool"][i % 4]
    queries[f"q{i}"] = reader.transcript_query_tokens(role, None, [w])
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
        [sys.executable, "-c", WORKER, str(cores), str(N_TURNS)],
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
seed=42, 64 shards), identical code, two parallelism levels in separate
Spark sessions. Same query results at both levels (hits={lo['hits']}).

| parallelism | build sec | turns/sec | query sec (64 batched queries) | queries/sec |
|---|---|---|---|---|
| local[{N_LOW}] | {lo['build_sec']:.1f} | {lo['turns_per_sec']:,.0f} | {lo['query_sec']:.1f} | {lo['queries_per_sec']:.2f} |
| local[{N_HIGH}] | {hi['build_sec']:.1f} | {hi['turns_per_sec']:,.0f} | {hi['query_sec']:.1f} | {hi['queries_per_sec']:.2f} |

Scaling efficiency (throughput ratio / core ratio):
**build {eff_build:.2f}**, **query {eff_query:.2f}** (target >= 0.8 on build
throughput per north rule; query fan-out at this scale is dominated by
fixed per-query job-scheduling latency, see BENCH notes).
"""
    with open("BENCH.md", "a") as f:
        f.write(table)
    print("appended to BENCH.md")


if __name__ == "__main__":
    main()
