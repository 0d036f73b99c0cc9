"""Pinned 4-vs-16 scaling probe for the full curation funnel — the
round-5 operator family (quality/langid scoring, repetition signals,
decontamination, exact-dedup keeper window, distributed token-budget
prefix sum composed as q_full_curation).

Input: a deterministic REPLICAS-x blow-up of the sf0.1 documents table.
Replica r offsets doc_id by r*KEY_OFFSET and suffixes every
NON-STOPWORD token with "_r{r}": replicas stay content-disjoint in
shingle space (so the exact-dedup keeper window and the decontamination
probe do per-replica work that scales linearly) while the stopword
vocabulary — which the language gate and the quality score's
stopword-ratio term key on — is preserved, keeping every funnel gate
live at every scale. Absolute gate pass-rates differ from sf0.1 (token
suffixes change lengths); that is irrelevant to the probe, which only
requires the SAME job at both parallelism levels on the SAME input.

Protocol identical to bench_scaling.py / dedup_scaling.py: fresh
taskset-pinned subprocess per level (JVM availableProcessors == level),
tmpfs scratch, page-cache pre-fault, interleaved trials, min per level,
efficiency = (rate_4N / rate_N) / 4. --update-baseline records under
"curation_funnel_probe" in BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = os.environ.get("CURATION_PROBE_DIR", "/root/repo/data/curationprobe")
# 64x (320k docs) keeps the 16-core wall over ~1 min so fixed costs
# (plan build, the prefix-sum localCheckpoint barrier, broadcast build)
# stay a small share of the measurement
REPLICAS = int(os.environ.get("CURATION_REPLICAS", "64"))
KEY_OFFSET = 1_000_000
N_SMALL = int(os.environ.get("SCALE_N", "4"))
REPEAT = int(os.environ.get("SCALE_REPEAT", "1"))


def ensure_probe_data() -> None:
    if os.path.exists(f"{PROBE_DIR}/_DONE"):
        return
    import pyspark.sql.functions as F

    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import _PROFILES
    from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session

    stop = sorted({w for ws in _PROFILES.values() for w in ws})
    spark = build_session(app="curation-probe-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    assert max_id < KEY_OFFSET
    rep = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    blown = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_r") * KEY_OFFSET).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.when(t.isin(*stop), t).otherwise(
                        F.concat(t, F.lit("_r"), F.col("_r").cast("string"))
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )
    blown.repartition(64).write.mode("overwrite").parquet(
        f"{PROBE_DIR}/documents.parquet"
    )
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
import pyspark.sql.functions as F
from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session
from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import decontaminate
from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import (
    curate, repetition_signals, token_budget)

cpus, probe_dir, repeat = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = build_session(app=f"curation-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{probe_dir}/documents.parquet")
n_docs = docs.count()  # warm JVM (page cache pre-faulted by the parent)

def funnel():
    # q_full_curation's exact composition, constant config at any
    # level: ONE materialized doc-grain base feeds every gate branch
    # (without it each branch re-scans and re-derives the corpus text)
    p = spark.sparkContext.defaultParallelism
    base = docs.repartition(
        max(p, docs.rdd.getNumPartitions()), "doc_id").localCheckpoint()
    kept = curate(base, min_quality=0.5, langs=("en",)).select("doc_id")
    rep_ok = (repetition_signals(base)
              .where((F.floor(F.col("top2_frac") * 10000) / 10000) <= 0.15)
              .select("doc_id"))
    ev = base.where(F.col("doc_id") % 97 == 0)
    dec_ok = (decontaminate(base, ev, threshold=0.5)
              .where(~F.col("contaminated")).select("doc_id"))
    surv = (base.join(kept, "doc_id", "semi")
            .join(rep_ok, "doc_id", "semi")
            .join(dec_ok, "doc_id", "semi"))
    return token_budget(surv, budget=1_000_000_000)

best = None
for _ in range(repeat):
    t0 = time.time()
    funnel().write.format("noop").mode("overwrite").save()
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
        "metric": "curation_funnel_scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"(T_{N_SMALL*4} / T_{N_SMALL}) / 4, min-of-{trials} per level, interleaved",
        "job": "full curation funnel (quality/langid scoring -> repetition "
               "signals -> decontamination -> exact-dedup keepers -> "
               "distributed token-budget prefix sum)",
        "input": f"{PROBE_DIR} ({probe_replicas()}x sf0.1 documents, "
                 f"non-stopword-suffixed content-disjoint replicas)",
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
        data["curation_funnel_probe"] = result
        with open("/root/repo/BENCH_SCALING.json", "w") as fh:
            json.dump(data, fh, indent=2)
    return result


if __name__ == "__main__":
    main()
