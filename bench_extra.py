"""Ad-hoc per-query benchmark harness for optimization work (round 7).

``bench.py`` is FROZEN for driver measurement; this file exists so the
optimization loop can time ARBITRARY SUBSETS of the query list (and
experimental variants) without touching it. Same methodology: noop
sink / collect per query, N interleaved trials, per-query minimum.

Usage:
    python bench_extra.py [query ...]           # subset (default: all)
    SPARK_GRAFT_BENCH_TRIALS=3 python bench_extra.py enrich_flat parse_containers
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TRIALS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")))


def main():
    from bench import query_list
    from bench_scaling import warm_input
    from fluent_plugin_kubernetes_metadata_filter_spark.io import load_table
    from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session

    wanted = sys.argv[1:]
    spark = build_session(app="bench_extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_input(SF_DIR)
    load_table(spark, SF_DIR, "transcripts").count()

    qs = query_list(spark, SF_DIR)
    if wanted:
        known = {n for n, _ in qs}
        missing = [w for w in wanted if w not in known]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        qs = [(n, f) for n, f in qs if n in wanted]

    timings: dict[str, list[float]] = {n: [] for n, _ in qs}
    for _trial in range(TRIALS):
        for name, fn in qs:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn()
            timings[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "queries_min": {n: min(v) for n, v in timings.items()},
        "queries_samples": timings,
        "n_trials": TRIALS,
        "cpus": int(CPUS),
        "sf": SF_DIR,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
