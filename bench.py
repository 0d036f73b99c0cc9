"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline metric is end-to-end enrich+route throughput in turns/sec
(BASELINE.json): full parse -> enrich -> fan-out write -> per-sink
counts over the transcripts table.

Noise protocol: this VM drifts +-20-40% hour-to-hour, so a single shot
per query is noise-dominated (the round-3 headline "regressed" 10.5% on
code that had not changed). The query list runs $SPARK_GRAFT_BENCH_TRIALS
times (default 2) INTERLEAVED — pass 1 of every query, then pass 2 — and
each query reports its per-trial MINIMUM: contention only ever adds
time, so min is the least-biased estimator, and interleaving keeps a
drift window from poisoning one whole trial. Same protocol as
bench_scaling.py.
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
TRIALS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2")))


def query_list(spark, sf_dir):
    """(name, thunk) per headline query; each thunk executes one full
    job (collect for small results, noop write for wide ones)."""
    from fluent_plugin_kubernetes_metadata_filter_spark import pipeline, queries as q
    from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_routed(cfg=PipelineConfig()):
        out = tempfile.mkdtemp(prefix="bench-routed-")
        try:
            pipeline.run(spark, sf_dir, out_dir=out, cfg=cfg).collect()
        finally:
            shutil.rmtree(out, ignore_errors=True)

    return [
        ("enrich_route_write", lambda: run_routed()),
        # single-exchange layout (route_exchange=False): the
        # scale-friendly physical plan at this sink count — same written
        # content, one shuffle
        ("enrich_route_write_direct",
         lambda: run_routed(PipelineConfig(route_exchange=False))),
        ("enrich_flat", lambda: noop(q.q_enrich_flat(spark, sf_dir))),
        ("route_counts", lambda: q.q_route_counts(spark, sf_dir).collect()),
        ("parse_containers", lambda: noop(q.q_parse_containers(spark, sf_dir))),
        ("stable_order", lambda: noop(q.q_stable_order(spark, sf_dir))),
        ("per_conv_stats", lambda: noop(q.q_per_conv_stats(spark, sf_dir))),
        ("dedup_exact", lambda: noop(q.q_dedup_exact(spark, sf_dir))),
        ("incremental_dedup", lambda: noop(q.q_incremental_dedup(spark, sf_dir))),
        ("incremental_dedup_bloom",
         lambda: noop(q.q_incremental_dedup_bloom(spark, sf_dir))),
        ("substring_dedup", lambda: noop(q.q_substring_dedup(spark, sf_dir))),
        ("sample_k", lambda: q.q_sample_k(spark, sf_dir).collect()),
        ("ngram_jaccard", lambda: q.q_ngram_jaccard(spark, sf_dir).collect()),
        ("dedup_keepers", lambda: noop(q.q_dedup_keepers(spark, sf_dir))),
        ("dedup_pipeline", lambda: noop(q.q_dedup_pipeline(spark, sf_dir))),
        ("media_features", lambda: noop(q.q_media_features(spark, sf_dir))),
        ("media_neardup", lambda: q.q_media_neardup(spark, sf_dir).collect()),
        ("minhash_pairs", lambda: q.q_minhash_pairs(spark, sf_dir).collect()),
        ("simhash", lambda: noop(q.q_simhash(spark, sf_dir))),
        ("simhash_pairs", lambda: q.q_simhash_pairs(spark, sf_dir).collect()),
        ("ann_topk", lambda: q.q_ann_topk(spark, sf_dir).collect()),
        ("ann_topk_gemm", lambda: q.q_ann_topk_gemm(spark, sf_dir).collect()),
        # pre-training funnel: curation gates -> budgeted selection,
        # plus the two sub-document hygiene passes
        ("corpus_curation", lambda: noop(q.q_corpus_curation(spark, sf_dir))),
        ("token_budget", lambda: noop(q.q_token_budget(spark, sf_dir))),
        ("decontaminate", lambda: noop(q.q_decontaminate(spark, sf_dir))),
        ("paragraph_dedup", lambda: noop(q.q_paragraph_dedup(spark, sf_dir))),
        ("paragraph_scrub", lambda: noop(q.q_paragraph_scrub(spark, sf_dir))),
        ("repetition", lambda: noop(q.q_repetition(spark, sf_dir))),
        ("redact_pii", lambda: noop(q.q_redact_pii(spark, sf_dir))),
        ("full_curation", lambda: noop(q.q_full_curation(spark, sf_dir))),
        ("pack_sequences", lambda: noop(q.q_pack_sequences(spark, sf_dir))),
        ("pack_shuffled", lambda: noop(q.q_pack_shuffled(spark, sf_dir))),
        ("seed_similarity", lambda: noop(q.q_seed_similarity(spark, sf_dir))),
        ("semantic_dedup", lambda: noop(q.q_semantic_dedup(spark, sf_dir))),
        ("domain_mix", lambda: noop(q.q_domain_mix(spark, sf_dir))),
        ("unimax_mix", lambda: noop(q.q_unimax_mix(spark, sf_dir))),
        ("clean_lines", lambda: noop(q.q_clean_lines(spark, sf_dir))),
        ("lm_score", lambda: noop(q.q_lm_score(spark, sf_dir))),
        ("lm_score2", lambda: noop(q.q_lm_score2(spark, sf_dir))),
        ("perplexity_buckets", lambda: noop(q.q_perplexity_buckets(spark, sf_dir))),
        ("substring_keep_first", lambda: noop(q.q_substring_keep_first(spark, sf_dir))),
        ("media_phash", lambda: noop(q.q_media_phash(spark, sf_dir))),
        ("cluster_sample", lambda: noop(q.q_cluster_sample(spark, sf_dir))),
        ("tfidf_terms", lambda: noop(q.q_tfidf_terms(spark, sf_dir))),
        ("ngram_stats", lambda: q.q_ngram_stats(spark, sf_dir).collect()),
        ("dsir_weights", lambda: noop(q.q_dsir_weights(spark, sf_dir))),
        ("dsir_select", lambda: q.q_dsir_select(spark, sf_dir).collect()),
        # shuffle-join scaling probes over the TPC-H relations (not
        # broadcast-flattered at sf>=1: orders |x| lineitem goes sort-merge)
        ("pricing_summary", lambda: q.q_pricing_summary(spark, sf_dir).collect()),
        ("order_revenue", lambda: noop(q.q_order_revenue(spark, sf_dir))),
    ]


def bench(spark, sf_dir, trials=TRIALS):
    from bench_scaling import warm_input
    from fluent_plugin_kubernetes_metadata_filter_spark.io import load_table

    # pre-fault input data pages into the OS page cache (count() alone
    # reads only row-group metadata; a cold first trial would pay raw
    # vda throughput inside the timed window)
    warm_input(sf_dir)
    # warm the dim/aux generation + JVM before timing
    n_turns = load_table(spark, sf_dir, "transcripts").count()

    qs = query_list(spark, sf_dir)
    timings: dict[str, float] = {}
    for _trial in range(trials):
        for name, fn in qs:
            t0 = time.time()
            fn()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
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
                "n_trials": TRIALS,
                "estimator": "min-per-query over interleaved trials",
                "cpus": int(CPUS),
                "sf": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
