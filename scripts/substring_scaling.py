"""Pinned 4-vs-16 scaling probe for substring_dedup (Lee et al.
ExactSubstr) — window-hash explode, fingerprint-frequency groupBy, SMJ
dup-window join, doc-grain islands/reassembly.

Input: the SAME content-disjoint blow-up dedup_scaling.py builds
(token-suffix bijection per replica). The suffixing preserves every
within-replica duplicated token RUN exactly — a duplicated k-token
window in sf0.1 is still a duplicated k-token window in every replica —
while replicas share no window fingerprints (every token differs), so
dup-window counts, span structure, and output scale linearly with
REPLICAS and no artificial cross-replica mega-frequency windows appear.

Protocol identical to dedup_scaling.py: fresh taskset-pinned subprocess
per level, tmpfs scratch, interleaved trials, min per level, efficiency
= (rate_4N / rate_N) / 4. --update-baseline records under
"substring_dedup_probe" in BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from dedup_scaling import PROBE_DIR, ensure_probe_data, probe_replicas, warm_input  # noqa: E402

N_SMALL = int(os.environ.get("SCALE_N", "4"))
REPEAT = int(os.environ.get("SCALE_REPEAT", "1"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import os as _os
_os.makedirs("/dev/shm/spark-local", exist_ok=True)
_os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session
from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import substring_dedup

cpus, probe_dir, repeat = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = build_session(app=f"substr-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{probe_dir}/documents.parquet")
n_docs = docs.count()  # warm JVM (page cache pre-faulted by the parent)
best = None
for _ in range(repeat):
    t0 = time.time()
    substring_dedup(docs, k=8).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "n_docs": n_docs, "sec": round(best, 3),
                  "docs_per_sec": round(n_docs / best, 1)}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    import shutil

    shutil.rmtree("/dev/shm/spark-local", ignore_errors=True)
    cmd = [sys.executable, "-c", CHILD, str(cpus), PROBE_DIR, str(REPEAT)]
    if os.path.exists("/usr/bin/taskset") and os.environ.get("SCALE_PIN", "1") == "1":
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"child failed: {out.stderr[-2000:]}")
    return json.loads(line[-1])


def main():
    ensure_probe_data()
    warm_input()
    trials = int(os.environ.get("SCALE_TRIALS", "2"))
    runs: dict[int, list[dict]] = {N_SMALL: [], N_SMALL * 4: []}
    for _ in range(trials):
        for n in (N_SMALL, N_SMALL * 4):
            r = run_level(n)
            runs[n].append(r)
            print(json.dumps(r), flush=True)
    small = max(runs[N_SMALL], key=lambda r: r["docs_per_sec"])
    big = max(runs[N_SMALL * 4], key=lambda r: r["docs_per_sec"])
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / 4
    result = {
        "metric": "substring_dedup_scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"(T_{N_SMALL*4} / T_{N_SMALL}) / 4, min-of-{trials} per level, interleaved",
        "job": "substring_dedup k=8 (window-hash explode -> frequency "
               "groupBy -> SMJ dup join -> doc-grain islands/reassembly)",
        "input": f"{PROBE_DIR} ({probe_replicas()}x sf0.1 documents, "
                 f"token-suffixed content-disjoint replicas)",
        "small": small,
        "big": big,
        "trials": runs,
    }
    print(json.dumps(result))
    if "--update-baseline" in sys.argv:
        key = os.environ.get("SCALE_RESULT_KEY", "substring_dedup_probe")
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
