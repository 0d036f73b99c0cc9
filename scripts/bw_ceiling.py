"""Memory-bandwidth ceiling probe: how much AGGREGATE copy bandwidth
does this box deliver to 4 vs 16 pinned cores?

A two-sided shuffle join does almost no arithmetic per byte — scan,
hash, serialize, sort — so on a single box its N-vs-4N scaling is
bounded by the shared memory controller, not by the plan. This probe
measures that bound directly: N worker processes (taskset-pinned, one
per core) each stream-copy a buffer far larger than L3; the aggregate
bytes/s at 4 and 16 cores gives the hardware's own scaling efficiency
for bandwidth-bound work. If a shuffle-join job's measured efficiency
matches this number, the plan is at the hardware ceiling — on a real
multi-node cluster, memory and shuffle bandwidth scale with the node
count instead of being shared.

    python scripts/bw_ceiling.py          # prints one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SECONDS = float(os.environ.get("BW_SECONDS", "5"))

WORKER = r"""
import sys, time
import numpy as np
seconds, deadline = float(sys.argv[1]), float(sys.argv[2])
a = np.random.randint(0, 255, size=64_000_000, dtype=np.uint8)  # 64 MB >> L3
b = np.empty_like(a)
# warmup (also first-touches b's pages)
np.copyto(b, a)
# barrier on a shared wall-clock deadline: every worker's timed window
# starts together, so the summed bandwidth is measured under FULL
# contention. Self-timed windows would start skewed by per-process
# interpreter/numpy/alloc time — more skew at 16 workers than 4, which
# would inflate the 16-core aggregate and bias the ceiling upward.
while time.time() < deadline:
    time.sleep(0.001)
t0 = time.time(); n = 0
while time.time() - t0 < seconds:
    np.copyto(b, a)
    n += 1
dt = time.time() - t0
print((n * a.nbytes * 2) / dt)  # read + write bytes/s
"""


def level(cores: int) -> float:
    import time

    deadline = time.time() + 4.0  # spawn + import + 64MB alloc headroom
    procs = []
    for c in range(cores):
        cmd = ["taskset", "-c", str(c), sys.executable, "-c", WORKER,
               str(SECONDS), str(deadline)]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=120)
        total += float(out.strip().splitlines()[-1])
    return total


def main():
    trials = int(os.environ.get("BW_TRIALS", "3"))
    agg: dict[int, float] = {4: 0.0, 16: 0.0}
    samples: dict[int, list[float]] = {4: [], 16: []}
    for _ in range(trials):  # interleaved, max-per-level estimator
        for n in (4, 16):
            bw = level(n)
            samples[n].append(round(bw / 1e9, 2))
            agg[n] = max(agg[n], bw)
    eff = (agg[16] / agg[4]) / 4
    print(json.dumps({
        "metric": "memory_bandwidth_scaling_4_to_16",
        "value": round(eff, 3),
        "gbps_4": round(agg[4] / 1e9, 2),
        "gbps_16": round(agg[16] / 1e9, 2),
        "samples_gbps": samples,
        "note": "aggregate stream-copy bandwidth of N pinned single-core "
                "workers; the hardware ceiling for bandwidth-bound scaling "
                "on this box",
    }))


if __name__ == "__main__":
    main()
