"""Facade parity: KubernetesMetadataFilter.filter == enrich()."""

import pyspark.sql.functions as F

from fluent_plugin_kubernetes_metadata_filter_spark.filter import KubernetesMetadataFilter
from fluent_plugin_kubernetes_metadata_filter_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_facade_filter_and_emit(spark):
    pods = load_table(spark, SF, "pods_dim")
    ns = load_table(spark, SF, "namespaces_dim")
    df = load_table(spark, SF, "transcripts").limit(2000)
    f = KubernetesMetadataFilter(pods, ns, annotation_match=("custom.+",))
    out = f.filter(df, observe=True)
    n = out.count()
    assert n == 2000
    stats = f.dump_stats()
    assert stats["events_total"] == 2000
    emitted = f.emit(df)
    row = emitted.where(F.col("kubernetes_meta").isNotNull()).first()
    assert row.kubernetes_meta.namespace_name is not None
    # passthrough rows have null sub-records (record unchanged)
    assert emitted.where(F.col("kubernetes_meta").isNull()).count() > 0


def test_facade_rejects_unknown_param(spark):
    pods = load_table(spark, SF, "pods_dim")
    ns = load_table(spark, SF, "namespaces_dim")
    import pytest

    with pytest.raises(TypeError):
        KubernetesMetadataFilter(pods, ns, not_a_param=True)
