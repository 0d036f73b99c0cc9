"""O22/O23 counter parity via observe()."""

from fluent_plugin_kubernetes_metadata_filter_spark import pipeline
from fluent_plugin_kubernetes_metadata_filter_spark.metrics import PipelineStats

SF = "/root/testdata/sf0.001"


def test_pipeline_stats_counters(spark):
    df = pipeline.enrich_transcripts(spark, SF)
    stats = PipelineStats()
    observed = stats.attach(df)
    n = observed.count()
    d = stats.dump()
    assert d["events_total"] == n
    assert d["pod_enriched"] > 0
    assert d["id_cache_orphaned_record"] > 0
    assert d["passthrough"] > 0
    assert d["id_cache_pod_not_found_namespace"] > 0
    assert d["pod_enriched"] + d["passthrough"] <= d["events_total"]
    assert "wall_time_sec" in d
    import json

    json.loads(stats.dump_json())  # serializable
