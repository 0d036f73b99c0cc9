"""Multi-format sources + TTL dim policy."""

from datetime import datetime, timedelta

import pyspark.sql.functions as F

from fluent_plugin_kubernetes_metadata_filter_spark import io as eio
from fluent_plugin_kubernetes_metadata_filter_spark.enrich import enrich
from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig

SF = "/root/testdata/sf0.001"


def test_json_source_same_enrichment(spark, tmp_path, pods_dim, ns_dim):
    pq = eio.load_table(spark, SF, "transcripts").limit(500)
    jdir = str(tmp_path / "j")
    pq.write.json(jdir)
    back = eio.read_transcripts(spark, jdir, "json")
    assert back.count() == 500
    a = enrich(pq, pods_dim, ns_dim).select("conv_id", "turn_idx", "namespace_name", "pod_id")
    b = enrich(back, pods_dim, ns_dim).select("conv_id", "turn_idx", "namespace_name", "pod_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_csv_source_roundtrip(spark, tmp_path):
    pq = eio.load_table(spark, SF, "transcripts").limit(200)
    cdir = str(tmp_path / "c")
    pq.withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    ).write.option("header", "true").csv(cdir)
    back = eio.read_transcripts(spark, cdir, "csv")
    assert back.count() == 200
    assert [f.name for f in back.schema.fields] == [f.name for f in pq.schema.fields]
    assert "timestamp" in dict(back.dtypes)["ts"]  # ntz vs ltz: both fine for CSV
    assert back.where(F.col("ts").isNull()).count() == 0


def test_orc_source_same_enrichment(spark, tmp_path, pods_dim, ns_dim):
    """ORC round-trip: the columnar alternative must enrich identically
    to parquet (same schema, same pushdown-capable scan)."""
    pq = eio.load_table(spark, SF, "transcripts").limit(500)
    odir = str(tmp_path / "o")
    pq.write.orc(odir)
    back = eio.read_transcripts(spark, odir, "orc")
    assert back.count() == 500
    a = enrich(pq, pods_dim, ns_dim).select("conv_id", "turn_idx", "namespace_name", "pod_id")
    b = enrich(back, pods_dim, ns_dim).select("conv_id", "turn_idx", "namespace_name", "pod_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_write_routed_formats(spark, tmp_path):
    """The fan-out sink writes any Spark-bundled format; per-route
    directory layout and row counts must match parquet's."""
    df = spark.createDataFrame(
        [("a", 1, "ns-1"), ("b", 2, "ns-1"), ("c", 3, "ns-2")],
        "conv_id string, turn_idx int, namespace_name string",
    )
    import os

    counts = {}
    for fmt in ("parquet", "orc", "json"):
        out = str(tmp_path / fmt)
        eio.write_routed(df, out, format=fmt)
        parts = sorted(
            d for d in os.listdir(out) if d.startswith("namespace_name=")
        )
        assert parts == ["namespace_name=ns-1", "namespace_name=ns-2"], fmt
        counts[fmt] = spark.read.format(fmt).load(out).count()
    assert counts == {"parquet": 3, "orc": 3, "json": 3}


def test_dim_ttl_eviction(spark):
    now = datetime(2024, 6, 1)
    rows = [
        ("a", now - timedelta(hours=2)),
        ("b", now - timedelta(minutes=10)),
        ("c", None),
    ]
    dim = spark.createDataFrame(rows, "namespace_name string, last_seen timestamp")
    kept = {r.namespace_name for r in eio.dim_with_ttl(dim, now, 3600).collect()}
    assert kept == {"b"}  # stale + null-last-seen evicted
    # ttl disabled -> untouched (reference cache_ttl <= 0 -> :none)
    assert eio.dim_with_ttl(dim, now, 0).count() == 3
    # column absent -> untouched
    assert eio.dim_with_ttl(dim.drop("last_seen"), now, 3600).count() == 3
