"""Incremental vs full manifest-tree refresh at the ~10^3-shard regime.

Measures what a 1-dirty-shard resume pays for pruning-tree maintenance
under each policy on the SAME index:

  * full      — `_write_manifest_tree(mp)` with no dirty set (the
                pre-incremental behavior: one full token_hashes/ pass
                per level), timed by direct call on the same state;
  * increm    — default policy (partition-pruned level-1 rebuild of the
                one affected group + insert-only upper gates from the
                dirty shard's tokens only), measured both inside a real
                1-dirty-shard resume (`manifest_gate_write` phase) and
                as a direct call.

Equivalence is not re-proven here (tests/
test_tree_incremental.py proves level-1 byte parity and descent
soundness); this is the cost side.

Usage: taskset -c 0-31 python scripts/tree_incr_bench.py [n_turns] [n_shards] [reps]
  defaults: 1_000_000 turns, 1024 shards, 3 reps (alternating policies).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_SHARDS = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
N_REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from mdbloom.spark.build import BloomIndexWriter, IndexConfig
    from mdbloom.spark.session import get_spark
    from mdbloom.spark.transcripts import synthesize_transcripts
    from scripts.scaling_bench import canary_ms

    spark = get_spark("treeincr", master="local[32]",
                      shuffle_partitions=32)
    path = "/tmp/mdbloom_treeincr_idx"
    cfg = IndexConfig(n_per_record=40, probability=1e-3,
                      n_shards=N_SHARDS, chunk_slots=65536,
                      manifest_group_size=16)
    # force the incremental policy: this script MEASURES both sides to
    # place the auto crossover (TREE_INCREMENTAL_MIN_SHARDS), so it must
    # not be gated by it
    df = synthesize_transcripts(spark, N_TURNS, seed=42, n_partitions=64)
    shard_of = F.pmod(F.xxhash64("conv_id"), F.lit(N_SHARDS)).cast("int")
    # two variants of shard 3's rows; alternating keeps every resume a
    # REAL 1-dirty-shard rebuild of the same size
    variants = [
        df.withColumn("text", F.when(
            shard_of == 3, F.concat(F.col("text"), F.lit(" zzqa")))
            .otherwise(F.col("text"))),
        df.withColumn("text", F.when(
            shard_of == 3, F.concat(F.col("text"), F.lit(" zzqb")))
            .otherwise(F.col("text"))),
    ]
    w = BloomIndexWriter(spark, cfg, tree_refresh="incremental")
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.monotonic()
    stats0 = w.build(variants[0], path)
    report = {"n_turns": N_TURNS, "n_shards": N_SHARDS,
              "group_size": 16, "reps": N_REPS,
              "initial_build_s": round(time.monotonic() - t0, 1),
              "initial_tree_phase_s": stats0["phases"].get(
                  "manifest_gate_write"),
              "canary_start_ms": round(canary_ms(), 1),
              "full": [], "increm": []}
    manifest_path = os.path.join(path, "manifest")
    for rep in range(N_REPS):
        # a REAL 1-dirty-shard resume under the default (incremental)
        # policy: resume wall + the manifest_gate_write phase
        src = variants[(rep + 1) % 2]
        t0 = time.monotonic()
        stats = w.build(src, path, resume=True)
        wall = time.monotonic() - t0
        assert stats["built"] == 1, stats
        assert w._last_tree_mode == "incremental"
        report["increm"].append({
            "resume_wall_s": round(wall, 1),
            "tree_phase_s": stats["phases"].get("manifest_gate_write"),
            "canary_ms": round(canary_ms(), 1)})
        # the refresh alone, both modes, direct calls on the SAME state
        # (a second 1-shard insertion is cost-identical to the first;
        # the full rebuild reads every token_hashes partition per level)
        t0 = time.monotonic()
        w._write_manifest_tree(manifest_path, dirty_shards=[3])
        inc_s = time.monotonic() - t0
        assert w._last_tree_mode == "incremental"
        t0 = time.monotonic()
        w._write_manifest_tree(manifest_path)  # dirty unknown -> full
        full_s = time.monotonic() - t0
        assert w._last_tree_mode == "full"
        report["full"].append({"tree_refresh_s": round(full_s, 1),
                               "canary_ms": round(canary_ms(), 1)})
        report["increm"][-1]["tree_refresh_s"] = round(inc_s, 1)
        print(f"# rep{rep}: resume wall {wall:.1f}s phase "
              f"{stats['phases'].get('manifest_gate_write')}s | refresh "
              f"inc {inc_s:.1f}s full {full_s:.1f}s",
              file=sys.stderr, flush=True)
    best_full = min(r["tree_refresh_s"] for r in report["full"])
    best_inc = min(r["tree_refresh_s"] for r in report["increm"])
    report["tree_refresh_speedup"] = round(best_full / best_inc, 1)
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
