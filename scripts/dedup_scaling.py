"""Pinned 4-vs-16 scaling probe for dedup_pipeline — the most
shuffle-diverse job in the repo (exact-fingerprint window, MinHash
signature groupBy, capped band expansion, Jaccard verify joins,
O(log d) label-propagation rounds).

Input: a deterministic REPLICAS-x blow-up of the sf0.1 documents table.
Replica r offsets doc_id by r*KEY_OFFSET AND suffixes every token with
"_r{r}" — a bijection on the token vocabulary, so each replica keeps the
EXACT intra-replica duplicate structure of sf0.1 while replicas are
fully disjoint in shingle space (no cross-replica candidate pairs, no
artificial mega-clusters): total work and output scale linearly with
REPLICAS and per-bucket fan-in is unchanged.

Protocol identical to bench_scaling.py / join_scaling.py: each level in
a fresh taskset-pinned subprocess (JVM availableProcessors == level),
tmpfs scratch, interleaved trials, min per level, efficiency =
(rate_4N / rate_N) / 4. Use --update-baseline to record the result
under "dedup_pipeline_probe" in BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = os.environ.get("DEDUP_PROBE_DIR", "/root/repo/data/dedupprobe")
# 64x (320k docs) holds the 16-core wall above ~2 min so fixed per-job
# costs (plan build, stage barriers, label-round driver sync) stay <5%
# of the measurement — at 32x the optimized job finished in ~60s and
# those constants depressed measured efficiency to 0.57; 128x exceeded
# any reasonable trial budget on this box
REPLICAS = int(os.environ.get("DEDUP_REPLICAS", "64"))
KEY_OFFSET = 1_000_000
N_SMALL = int(os.environ.get("SCALE_N", "4"))
REPEAT = int(os.environ.get("SCALE_REPEAT", "2"))


def ensure_probe_data() -> None:
    if os.path.exists(f"{PROBE_DIR}/_DONE"):
        return
    import pyspark.sql.functions as F

    from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session

    spark = build_session(app="dedup-probe-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    assert max_id < KEY_OFFSET, (
        f"max doc_id {max_id} >= KEY_OFFSET {KEY_OFFSET}: raise KEY_OFFSET"
    )
    rep = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    blown = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_r") * KEY_OFFSET).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit("_r"), F.col("_r").cast("string")),
                ),
                " ",
            ).alias("text"),
        )
    )
    blown.repartition(64).write.mode("overwrite").parquet(f"{PROBE_DIR}/documents.parquet")
    open(f"{PROBE_DIR}/_DONE", "w").write(f"{REPLICAS}\n")
    spark.stop()


def probe_replicas() -> str:
    try:
        return open(f"{PROBE_DIR}/_DONE").read().strip() or "?"
    except OSError:
        return "?"


CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import os as _os
_os.makedirs("/dev/shm/spark-local", exist_ok=True)
_os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session
from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import dedup_pipeline

cpus, probe_dir, repeat = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = build_session(app=f"dedup-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{probe_dir}/documents.parquet")
n_docs = docs.count()  # warm JVM (page cache pre-faulted by the parent)
best = None
for _ in range(repeat):
    t0 = time.time()
    dedup_pipeline(docs).write.format("noop").mode("overwrite").save()
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


def warm_input() -> None:
    """Pre-fault the probe parquet into the page cache: parquet count()
    inside the child reads only row-group metadata, so without this the
    first timed run pays raw disk throughput (see bench_scaling.py)."""
    import glob

    for f in glob.glob(f"{PROBE_DIR}/documents.parquet/*"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass


def main():
    ensure_probe_data()
    warm_input()
    trials = int(os.environ.get("SCALE_TRIALS", "3"))
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
        "metric": "dedup_pipeline_scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"(T_{N_SMALL*4} / T_{N_SMALL}) / 4, min-of-{trials} per level, interleaved",
        "job": "dedup_pipeline (exact window -> minhash groupBy -> capped "
               "band expansion -> jaccard verify -> label propagation)",
        "input": f"{PROBE_DIR} ({probe_replicas()}x sf0.1 documents, "
                 f"token-suffixed content-disjoint replicas)",
        "small": small,
        "big": big,
        "trials": runs,
    }
    print(json.dumps(result))
    if "--update-baseline" in sys.argv:
        data = {}
        try:
            with open("/root/repo/BENCH_SCALING.json") as fh:
                data = json.load(fh)
        except FileNotFoundError:
            pass
        data["dedup_pipeline_probe"] = result
        with open("/root/repo/BENCH_SCALING.json", "w") as fh:
            json.dump(data, fh, indent=2)
    return result


if __name__ == "__main__":
    main()
