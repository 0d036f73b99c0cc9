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
                 mode: str = "overwrite") -> None:
    """Fan-out sink (O4): one directory per route key, like the
    reference's per-tag <match> routing (README.md:104-110). Null route
    keys (passthrough rows) land in the Hive default partition.

    At scale this is the only shuffle-adjacent step — see route.py for
    the salting that precedes it."""
    df.write.mode(mode).partitionBy(route_column).parquet(out_dir)
