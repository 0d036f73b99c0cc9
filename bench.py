"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline metric is end-to-end enrich+route throughput in turns/sec
(BASELINE.json): full parse -> enrich -> fan-out write -> per-sink
counts over the transcripts table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def bench(spark, sf_dir):
    from fluent_plugin_kubernetes_metadata_filter_spark import pipeline, queries as q
    from fluent_plugin_kubernetes_metadata_filter_spark.io import load_table

    timings = {}

    # warm the dim/aux generation + JVM before timing
    n_turns = load_table(spark, sf_dir, "transcripts").count()

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    out = tempfile.mkdtemp(prefix="bench-routed-")
    try:
        timed("enrich_route_write", lambda: pipeline.run(spark, sf_dir, out_dir=out).collect())
    finally:
        shutil.rmtree(out, ignore_errors=True)
    # single-exchange layout (route_exchange=False): the scale-friendly
    # physical plan at this sink count — same written content, one shuffle
    from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig

    out2 = tempfile.mkdtemp(prefix="bench-routed-direct-")
    try:
        timed(
            "enrich_route_write_direct",
            lambda: pipeline.run(
                spark, sf_dir, out_dir=out2, cfg=PipelineConfig(route_exchange=False)
            ).collect(),
        )
    finally:
        shutil.rmtree(out2, ignore_errors=True)
    timed("enrich_flat", lambda: q.q_enrich_flat(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("route_counts", lambda: q.q_route_counts(spark, sf_dir).collect())
    timed("parse_containers", lambda: q.q_parse_containers(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("stable_order", lambda: q.q_stable_order(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("per_conv_stats", lambda: q.q_per_conv_stats(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("dedup_exact", lambda: q.q_dedup_exact(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("ngram_jaccard", lambda: q.q_ngram_jaccard(spark, sf_dir).collect())
    timed("dedup_keepers", lambda: q.q_dedup_keepers(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("dedup_pipeline", lambda: q.q_dedup_pipeline(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("media_features", lambda: q.q_media_features(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("minhash_pairs", lambda: q.q_minhash_pairs(spark, sf_dir).collect())
    timed("simhash", lambda: q.q_simhash(spark, sf_dir).write.format("noop").mode("overwrite").save())
    timed("simhash_pairs", lambda: q.q_simhash_pairs(spark, sf_dir).collect())
    timed("ann_topk", lambda: q.q_ann_topk(spark, sf_dir).collect())
    timed("ann_topk_gemm", lambda: q.q_ann_topk_gemm(spark, sf_dir).collect())
    # shuffle-join scaling probes over the TPC-H relations (not
    # broadcast-flattered at sf>=1: orders |x| lineitem goes sort-merge)
    timed("pricing_summary", lambda: q.q_pricing_summary(spark, sf_dir).collect())
    timed("order_revenue", lambda: q.q_order_revenue(spark, sf_dir).write.format("noop").mode("overwrite").save())

    return n_turns, timings


def main():
    from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session

    spark = build_session(app="bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    n_turns, timings = bench(spark, SF_DIR)
    total = sum(timings.values())
    tps = round(n_turns / timings["enrich_route_write"], 1)
    print(
        json.dumps(
            {
                "metric": "enrich_route_throughput",
                "value": tps,
                "unit": "turns/sec",
                "queries": timings,
                "total_sec": round(total, 3),
                "n_turns": n_turns,
                "cpus": int(CPUS),
                "sf": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
