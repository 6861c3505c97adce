"""One-window experiment: does the register-only Spark probe's N-vs-4N
efficiency depend on job LENGTH? The recorded 'Spark-on-this-VM ceiling
~0.60' came from a ~2 s (32-core) probe — short enough that per-job
scheduling, fresh-session JIT, and thread ramp-up could cap it. If the
same job at 4x/8x the rows scales materially better, the ceiling number
is a short-job artifact and the build's 0.50-0.62 pairs need a
larger-input capture; if it stays ~0.6, the host attribution hardens.

Usage: taskset is applied per leg inside; run alone in a quiet window.
    python scripts/exp_probe_length.py [reps]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_CPU = r"""
import sys, time
sys.path.insert(0, ".")
from mdbloom.spark.session import get_spark
cores = int(sys.argv[1]); rows = int(sys.argv[2])
spark = get_spark(f"cpu{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
# warm-up: JIT the codegen'd stage at small scale first
spark.range(50_000_000, numPartitions=cores * 4) \
    .selectExpr("bit_xor(xxhash64(id, id + 1, id + 2))").collect()
t0 = time.monotonic()
spark.range(rows, numPartitions=cores * 8) \
    .selectExpr("bit_xor(xxhash64(id, id + 1, id + 2))").collect()
print("RESULT", time.monotonic() - t0)
"""


def spark_cpu(cores: int, rows: int) -> float:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
         SPARK_CPU, str(cores), str(rows)],
        capture_output=True, text=True, cwd=REPO)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-2000:])


def canary_ms() -> float:
    from scripts.scaling_bench import canary_ms as c
    return c()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sizes = [3_000_000_000, 12_000_000_000, 24_000_000_000]
    secs: dict[tuple[int, int], list[float]] = {}
    canaries = [round(canary_ms(), 1)]
    for rep in range(reps):
        for rows in sizes:
            for cores in (8, 32):
                t = spark_cpu(cores, rows)
                secs.setdefault((rows, cores), []).append(t)
                canaries.append(round(canary_ms(), 1))
                print(f"# rep{rep} rows={rows:,} cores={cores}: {t:.1f}s "
                      f"canary {canaries[-1]}ms",
                      file=sys.stderr, flush=True)
    report = {"reps": reps, "canaries_ms": canaries, "legs": {}}
    for rows in sizes:
        lo, hi = secs[(rows, 8)], secs[(rows, 32)]
        report["legs"][str(rows)] = {
            "sec_8": [round(x, 1) for x in lo],
            "sec_32": [round(x, 1) for x in hi],
            "eff_best": round((min(lo) / min(hi)) / 4, 3),
            "eff_all": [round((a / b) / 4, 3) for a, b in zip(lo, hi)],
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
