"""Hardware scaling ceiling for the N-vs-4N criterion.

A perfectly parallel, CPU-bound workload (the job's hot loop: Java-style
regex matching over tag strings) run at N and 4N pinned cores. Any
efficiency this box loses HERE is machine, not plan: there is no shuffle,
no barrier, no GC coupling — each process spins on its own core. The
measured ceiling divides the Spark job's raw efficiency to give the
plan's normalized efficiency (VERDICT round 1 asked for exactly this
experiment to be committed as a script).

Method notes:
- taskset-pinned to 0..N-1, same as bench_scaling.py;
- levels interleaved across trials and the MIN per level is used —
  contention on this shared VM only ever adds time, so min-of-k is the
  estimator least polluted by host noise (raw per-trial values are all
  reported);
- per-task work is constant, so throughput = tasks/second and
  efficiency = (tps_4N / tps_N) / 4.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import re
import sys
import time

RX = re.compile(
    r"var\.log\.containers\.([a-z0-9-]+)_([a-z0-9-]+)_([a-z0-9-]+)-([0-9a-f]{64})\.log"
)
S = "var.log.containers.pod-abc-123_ns-07_main-" + "ab" * 32 + ".log"
ITERS = 2_000_000  # ~3s/task: long enough to flatten scheduler noise


def _task(_):
    t0 = time.time()
    for _ in range(ITERS):
        RX.search(S)
    return time.time() - t0


def _membw_task(_):
    """Memory-bandwidth-bound task: stream over a buffer far larger than
    L3. Shuffle buffers, parquet decode, and Tungsten row copies are this
    shape; on a single box all pinned cores share one memory controller,
    so this probes the OTHER hardware ceiling (a multi-executor cluster
    scales bandwidth with node count).

    SUPERSEDED for the bandwidth number by scripts/bw_ceiling.py, whose
    workers are separate pinned processes with start-synchronized timed
    windows and ~5s of steady-state streaming; this pool-based task is
    short (~0.3s) relative to dispatch overhead, so its bandwidth figure
    is noisier than the cpu_regex one. Kept as the round-2 protocol of
    record."""
    import numpy as np

    a = np.zeros(64 * 1024 * 1024 // 8, dtype=np.float64)  # 64 MB
    t0 = time.time()
    for _ in range(20):
        a += 1.0
    return time.time() - t0


def run_level(n: int, task=_task, waves: int = 2) -> dict:
    os.sched_setaffinity(0, set(range(n)))
    with mp.Pool(n) as pool:
        t0 = time.time()
        per_task = pool.map(task, range(n * waves))
        wall = time.time() - t0
    os.sched_setaffinity(0, set(range(os.cpu_count())))
    return {
        "cores": n,
        "tasks": n * waves,
        "wall": round(wall, 2),
        "tps": round(n * waves / wall, 3),
        "task_mean": round(sum(per_task) / len(per_task), 3),
    }


def ceiling(n_small: int, trials: int, task, name: str) -> dict:
    runs: dict[int, list[dict]] = {n_small: [], n_small * 4: []}
    for _ in range(trials):
        for n in (n_small, n_small * 4):
            r = run_level(n, task)
            runs[n].append(r)
            print(json.dumps({"probe": name, **r}), flush=True)
    best = {n: max(rs, key=lambda r: r["tps"]) for n, rs in runs.items()}
    eff = (best[n_small * 4]["tps"] / best[n_small]["tps"]) / 4
    return {"probe": name, "efficiency": round(eff, 3), "levels": runs}


def main(n_small: int = 4, trials: int = 3) -> dict:
    cpu = ceiling(n_small, trials, _task, "cpu_regex")
    bw = ceiling(n_small, trials, _membw_task, "memory_bandwidth")
    result = {
        "metric": "hardware_scaling_ceiling",
        "cpu_regex": cpu["efficiency"],
        "memory_bandwidth": bw["efficiency"],
        "unit": f"(tps_{n_small * 4} / tps_{n_small}) / 4, min-of-{trials} per level",
        "note": (
            "single-box N-vs-4N ceilings by resource: embarrassingly "
            "parallel CPU work vs shared-memory-controller streaming. A "
            "Spark job mixes both; a real N-vs-4N EXECUTOR cluster scales "
            "bandwidth/disks/NICs with node count, this box cannot."
        ),
        "detail": [cpu, bw],
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
