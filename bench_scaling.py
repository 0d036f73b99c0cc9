"""Scaling-efficiency evidence (BASELINE.json): run the SAME enrich+route
job at two parallelism levels (local[N] and local[4N]) on the same input
and report throughput at both plus efficiency = (T_4N / T_N) / 4.

Each level runs in a fresh subprocess (own JVM) pinned with
``taskset -c 0-(N-1)`` so the process genuinely has N cores — the
"N and 4N cores" form of the criterion. Without pinning, a local[4] JVM
on a 32-core box still uses all 32 cores for GC/JIT/IO threads
(ParallelGCThreads auto-sizes to the machine), silently inflating the
small level and depressing measured efficiency; under taskset the JVM's
availableProcessors — and therefore its GC sizing — match the level.
Prints one JSON line; use --update-baseline to write BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_SMALL = int(os.environ.get("SCALE_N", "8"))
REPEAT = int(os.environ.get("SCALE_REPEAT", "2"))

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session
from fluent_plugin_kubernetes_metadata_filter_spark import pipeline
from fluent_plugin_kubernetes_metadata_filter_spark.io import load_table
from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig

cpus, sf_dir, repeat = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
# SAME job at every level: config constants don't track the level (a
# config that varies with cluster size would not be "the same job").
# Single-exchange layout (route_exchange=False): the wide route shuffle
# is gone, the conv_id window exchange is the job's only shuffle — the
# scale-friendly config at this sink count (see PipelineConfig).
cfg = PipelineConfig(salt_buckets=16, route_exchange=False)
import os as _os
# On a multi-node cluster shuffle/storage bandwidth scales with the node
# count; on one box a single disk would serialize it and hide plan-level
# scaling. tmpfs gives every thread-count the same per-core I/O, which is
# the property the N-vs-4N criterion is probing.
_os.makedirs("/dev/shm/spark-local", exist_ok=True)
_os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
spark = build_session(app=f"scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
n = load_table(spark, sf_dir, "transcripts").count()  # warm JVM + aux data
best = None
for _ in range(repeat):
    out = tempfile.mkdtemp(prefix="scale-out-", dir="/dev/shm")
    t0 = time.time()
    pipeline.run(spark, sf_dir, out_dir=out, cfg=cfg).collect()
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "n_turns": n, "sec": round(best, 3),
                  "tps": round(n / best, 1)}))
spark.stop()
"""


def warm_input(sf_dir: str) -> None:
    """Pull the input parquet into the OS page cache before any level
    runs. The parquet count() warmup inside the child reads only
    row-group metadata, NOT data pages — so without this, each timed
    run pays the box's raw disk throughput (measured as low as
    ~50 MB/s on this VM's single vda) as a constant that swamps the
    plan's scaling signal. Storage on one box is a shared non-scaling
    resource; the N-vs-4N criterion targets plan/CPU scaling, which a
    RAM-resident input isolates (the same reason shuffle scratch goes
    to tmpfs)."""
    import glob

    for f in glob.glob(f"{sf_dir}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass


def run_level(cpus: int) -> dict:
    # fresh tmpfs scratch per level: leftover shuffle/local state from the
    # previous level's JVM measurably contaminates the next run
    import shutil

    shutil.rmtree("/dev/shm/spark-local", ignore_errors=True)
    cmd = [sys.executable, "-c", CHILD, str(cpus), SF_DIR, str(REPEAT)]
    if os.path.exists("/usr/bin/taskset") and os.environ.get("SCALE_PIN", "1") == "1":
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"child failed: {out.stderr[-2000:]}")
    return json.loads(line[-1])


def main():
    warm_input(SF_DIR)
    trials = int(os.environ.get("SCALE_TRIALS", "3"))
    runs: dict[int, list[dict]] = {N_SMALL: [], N_SMALL * 4: []}
    # interleave levels across trials so slow-timescale host drift (this
    # VM's wall times wander by +/-20% over hours) hits both levels alike;
    # the per-level MIN is the estimator — contention only ever ADDS time.
    for _ in range(trials):
        for n in (N_SMALL, N_SMALL * 4):
            r = run_level(n)
            runs[n].append(r)
            print(json.dumps(r), flush=True)
    small = max(runs[N_SMALL], key=lambda r: r["tps"])
    big = max(runs[N_SMALL * 4], key=lambda r: r["tps"])
    eff = (big["tps"] / small["tps"]) / 4
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"(T_{N_SMALL*4} / T_{N_SMALL}) / 4, min-of-{trials} per level, interleaved",
        "small": small,
        "big": big,
        "trials": runs,
        "sf": SF_DIR,
    }
    print(json.dumps(result))
    if "--update-baseline" in sys.argv:
        # merge under a round key — a bare overwrite would clobber the
        # probe results other scripts record in the same file
        key = os.environ.get("SCALE_RESULT_KEY", "latest_confirmation")
        data = {}
        try:
            with open("/root/repo/BENCH_SCALING.json") as fh:
                data = json.load(fh)
        except FileNotFoundError:
            pass
        data[key] = result
        with open("/root/repo/BENCH_SCALING.json", "w") as fh:
            json.dump(data, fh, indent=2)
    return result


if __name__ == "__main__":
    main()
