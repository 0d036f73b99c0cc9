"""Sources & sinks (SURVEY.md O1-O4).

The design targets Iceberg tables (snapshot-isolated dimension refresh
replaces the reference's watch threads, SURVEY.md section 3.3); the
sandbox image has no Iceberg jars, so the Iceberg path is gated behind an
import/config try and everything falls back to plain parquet with
identical semantics at test scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fluent_plugin_kubernetes_metadata_filter_spark.datagen import ensure_sf

TRANSCRIPT_TABLES = (
    "transcripts",
    "transcripts_carried",
    "pods_dim",
    "namespaces_dim",
    "pod_containers_dim",
    "pod_annotations_dim",
    "ns_annotations_dim",
    "pod_labels_dim",
    "ns_labels_dim",
    "logs",
)


def aux_dir(sf_dir: str) -> str:
    """Generated transcripts/dims live beside (not inside) the read-only
    driver testdata; deterministic, created on first use."""
    return ensure_sf(sf_dir)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table for a scale-factor dir. Driver-provided TPC-H-ish
    tables come from sf_dir itself; transcripts/dim tables from the
    generated aux dir."""
    if name in TRANSCRIPT_TABLES:
        base = aux_dir(sf_dir)
    else:
        base = sf_dir
    return spark.read.parquet(os.path.join(base, f"{name}.parquet"))


def try_iceberg_table(spark: SparkSession, identifier: str) -> DataFrame | None:
    """Read an Iceberg table if a catalog is configured; None otherwise.

    On a real deployment: ``spark.read.format("iceberg").load(identifier)``
    with snapshot pinning via ``option("snapshot-id", ...)`` — the batch
    analogue of the reference's `resource_version: '0'` cache-served list
    (filter_kubernetes_metadata.rb:103-105; SURVEY.md O28).
    """
    try:
        return spark.read.format("iceberg").load(identifier)
    except Exception:
        return None


def write_routed(df: DataFrame, out_dir: str, route_column: str = "namespace_name",
                 mode: str = "overwrite", format: str = "parquet") -> None:
    """Fan-out sink (O4): one directory per route key, like the
    reference's per-tag <match> routing (README.md:104-110). Null route
    keys (passthrough rows) land in the Hive default partition.

    ``format`` is any Spark-bundled columnar/line sink ("parquet"
    default; "orc" for ORC-based downstream stores; "json" for
    fluentd-style line consumers — map columns are serialized natively
    by the JSON sink).

    At scale this is the only shuffle-adjacent step — see route.py for
    the salting that precedes it."""
    df.write.mode(mode).partitionBy(route_column).format(format).save(out_dir)


TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_transcripts(spark: SparkSession, path: str, format: str = "parquet") -> DataFrame:
    """Multi-format transcript source (O1). Parquet is the scale path
    (columnar, pushdown); ORC is the equivalent columnar path for
    ORC-resident lakes (same pushdown/pruning, Spark-bundled reader);
    json/csv cover fluentd-style line ingestion.
    Schema is always explicit — inference is nondeterministic and scans
    the data twice."""
    if format == "parquet":
        return spark.read.parquet(path)
    if format == "orc":
        return spark.read.orc(path)
    if format == "json":
        return spark.read.schema(TRANSCRIPT_DDL).json(path)
    if format == "csv":
        return (
            spark.read.schema(TRANSCRIPT_DDL)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .csv(path)
        )
    raise ValueError(f"unsupported transcript format: {format}")


def dim_with_ttl(dim: DataFrame, now, ttl_seconds: int | None,
                 last_seen_col: str = "last_seen") -> DataFrame:
    """O25 TTL policy as a dim VIEW: rows older than the TTL are evicted
    from the snapshot; DELETED rows are deliberately NOT removed (the
    reference ignores DELETE notices so late records still enrich,
    kubernetes_metadata_watch_pods.rb:182-186). ttl None/<=0 disables
    eviction (the reference's cache_ttl <= 0 -> :none, filter:193-195)."""
    import pyspark.sql.functions as F

    if not ttl_seconds or ttl_seconds <= 0 or last_seen_col not in dim.columns:
        return dim
    cutoff = F.lit(now) - F.expr(f"INTERVAL {int(ttl_seconds)} SECONDS")
    return dim.where(F.col(last_seen_col) >= cutoff)
