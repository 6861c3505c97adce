"""Sustained-bandwidth window probe (hunt-c#11 protocol upgrade).

The 0.7 s scatter canary is blind to the host's real failure mode: in
hunt-c#11 it read healthy (165-224 ms) while the identical 4M-turn build
ran 4.7x degraded, and a 4 s sustained probe in the same minutes showed
8 threads moving LESS aggregate bytes than 1 (parallel ratio 0.12-0.23).
This probe blocks until the sustained 8-thread/1-thread streaming ratio
reaches a target (a genuinely healthy box shows ~3-6x), or a wait budget
expires. Each sample is one line of JSON on stderr; exit 0 = window
found, 1 = budget exhausted.

Usage: python scripts/bw_probe.py [min_ratio] [max_wait_sec] [poll_sec]
                                  [min_gbps8]
  defaults: 2.5, 1800, 90, 10.0.

``min_gbps8`` is an ABSOLUTE floor on the 8-thread aggregate (GB/s):
hunt-c#12 showed the ratio alone can false-positive when single-thread
bandwidth collapses harder than 8-thread (0.21 vs 0.81 GB/s -> ratio 3.8
on a badly degraded host). A healthy box streams tens of GB/s across 8
threads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# scaling_bench reads ITS OWN integer CLI at import time — hand it an
# empty argv and keep ours
_ARGV, sys.argv = sys.argv[1:], sys.argv[:1]

from scaling_bench import bandwidth_health, canary_ms  # noqa: E402


def main() -> int:
    min_ratio = float(_ARGV[0]) if len(_ARGV) > 0 else 2.5
    max_wait = float(_ARGV[1]) if len(_ARGV) > 1 else 1800.0
    poll = float(_ARGV[2]) if len(_ARGV) > 2 else 90.0
    min_gbps8 = float(_ARGV[3]) if len(_ARGV) > 3 else 10.0
    deadline = time.monotonic() + max_wait
    while True:
        sample = {"t": time.strftime("%H:%M:%S"),
                  "scatter_ms": round(canary_ms(), 1),
                  **bandwidth_health()}
        print(json.dumps(sample), file=sys.stderr, flush=True)
        if (sample["parallel_ratio"] >= min_ratio
                and sample["gbps_8t"] >= min_gbps8):
            return 0
        if time.monotonic() >= deadline:
            return 1
        time.sleep(poll)


if __name__ == "__main__":
    sys.exit(main())
