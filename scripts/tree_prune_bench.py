"""Hierarchical-manifest pruning evidence at >=10^3 shards (VERDICT r3
item 6 'done' criterion): build a transcripts index with 1024 shards and
a 3-level manifest tree, then compare batched distributed planning with
and without the tree — identical shard lists, and the planned leaf-scan
reduction (leaf manifest rows actually read) for batches whose tokens
miss whole shard groups.

Planned-scan counts are DETERMINISTIC (no host-window caveat applies);
wall times are single-window and reported as such per BENCH.md protocol.

Usage: taskset -c 0-31 python scripts/tree_prune_bench.py [n_turns]
Writes one JSON line to stdout; paste the summary into BENCH.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from mdbloom.spark.session import get_spark
    from mdbloom.spark.build import BloomIndexWriter, IndexConfig
    from mdbloom.spark.query import BloomIndexReader
    from mdbloom.spark.transcripts import synthesize_transcripts

    spark = get_spark()
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=1024,
                      chunk_slots=65536, manifest_group_size=16)
    import hashlib
    ckey = hashlib.md5((cfg.to_json() + str(n_turns)).encode()) \
        .hexdigest()[:8]
    path = f"/tmp/mdbloom_cache/treebench_{ckey}"
    df = synthesize_transcripts(spark, n_turns, seed=42)
    t0 = time.monotonic()
    BloomIndexWriter(spark, cfg).build(df, path, resume=True)
    build_s = time.monotonic() - t0
    r = BloomIndexReader(spark, path)

    # mixed batch: half ABSENT tokens (prune whole groups at the top of
    # the tree), half rare-but-present vocabulary tail tokens
    queries = {}
    for i in range(32):
        queries[f"absent{i}"] = [f"tok=zzq{i:04d}never"]
    for i in range(32):
        queries[f"tail{i}"] = [f"tok=w{3999 - i:05d}"]

    def run(use_tree):
        t = time.monotonic()
        res, stats = r.prune_shards_many_distributed(
            queries, use_tree=use_tree, return_stats=True)
        return res, stats, time.monotonic() - t

    # warm both paths once (session JIT / file listing), then measure
    run(False), run(True)
    flat_res, flat_stats, flat_s = run(False)
    tree_res, tree_stats, tree_s = run(True)
    assert flat_res == tree_res, "tree pruning changed shard lists!"

    out = {
        "metric": "tree_prune_bench",
        "n_turns": n_turns,
        "n_shards": cfg.n_shards,
        "group_size": cfg.manifest_group_size,
        "tree_levels": sorted(int(d.split("=")[1]) for d in os.listdir(
            os.path.join(path, "manifest_tree"))),
        "n_queries": len(queries),
        "build_s": round(build_s, 1),
        "flat_leaf_rows_scanned": flat_stats["leaf_rows_scanned"],
        "tree_leaf_rows_scanned": tree_stats["leaf_rows_scanned"],
        "tree_rows_read_descent": tree_stats["tree_rows_read"],
        "leaf_scan_reduction": round(
            1 - tree_stats["leaf_rows_scanned"]
            / max(1, flat_stats["leaf_rows_scanned"]), 4),
        "flat_plan_s": round(flat_s, 2),
        "tree_plan_s": round(tree_s, 2),
        "identical_shard_lists": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
