"""Routing, ordering, skew handling, and per-sink aggregates
(SURVEY.md O4, O22; section 4 "what needs explicit handling").

The reference hands enriched events back to fluentd's router which
fan-outs by tag (README.md:104-110) and counts per-path stats
(kubernetes_metadata_stats.rb:26-45). Here:

- per-sink counts are a ``groupBy(route).count()`` — map-side partial
  aggregation makes this one small shuffle;
- hot conversations (one pod producing a large share of turns) would
  hotspot a plain hash repartition, so the physical placement key is
  (conv_id, salt) where salt = xxhash64(conv_id, turn_idx) % S. The salt
  affects ONLY placement: output content is unchanged and per-conversation
  order is re-established logically by the (conv_id, turn_idx) window
  sort, so per-turn text equality with the reference holds exactly;
- observe() metrics give the counter semantics of O22 without a second
  pass over the data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, Window

from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig

# canonical label for the null-route sink, shared by every public entry
# point (per_sink_counts, pipeline.run, run_resumable lineage/counts)
PASSTHROUGH = "__passthrough__"


def salted_repartition(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Physical-only skew defuse: repartition on (conv_id, salt)."""
    salt = F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx")), F.lit(cfg.salt_buckets))
    df = df.withColumn("_salt", salt)
    n = cfg.shuffle_partitions
    df = df.repartition(n, "conv_id", "_salt") if n else df.repartition("conv_id", "_salt")
    return df.drop("_salt")


def route_partition(df: DataFrame, cfg: PipelineConfig,
                    route_column: str = "namespace_name") -> DataFrame:
    """Physical layout for the fan-out write: shuffle on
    (route_key, conv_salt) and sort within partitions.

    - clustering by route key means each write task emits files for only
      a few sink directories (not sinks x tasks small files);
    - the conv-level salt splits a HOT sink (one namespace dominating the
      table — the 'hot pod' in the reference's world) across
      ``salt_buckets`` tasks instead of melting one writer;
    - salting by conv_id (not turn_idx) keeps a conversation's turns in
      ONE task, so the within-partition sort yields contiguous, ordered
      conversation runs in every output file.
    """
    salt = F.pmod(F.xxhash64(F.col("conv_id")), F.lit(cfg.salt_buckets))
    df = df.withColumn("_salt", salt)
    n = cfg.shuffle_partitions
    key = F.coalesce(F.col(route_column), F.lit("__null__"))
    df = df.repartition(n, key, F.col("_salt")) if n else df.repartition(key, F.col("_salt"))
    return df.sortWithinPartitions(route_column, "conv_id", "turn_idx").drop("_salt")


def stable_order(df: DataFrame) -> DataFrame:
    """Logical per-conversation ordering: turn_seq = row_number over
    (conv_id ordered by turn_idx). Deterministic regardless of physical
    placement/salting (SURVEY.md section 7.4 item 4)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_seq", F.row_number().over(w))


def per_sink_counts(df: DataFrame, route_column: str = "namespace_name") -> DataFrame:
    """O4/O22 routed-count aggregate; null route = passthrough sink."""
    return (
        df.groupBy(F.coalesce(F.col(route_column), F.lit(PASSTHROUGH)).alias("sink"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def observed(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Counter semantics of kubernetes_metadata_stats.rb:26-45 via
    ``observe`` — computed inline with whatever action consumes the
    DataFrame, no extra job. Delegates to metrics._counters so each
    counter has exactly ONE definition (an earlier inline copy counted
    pod_enriched as count(pod_id), which also includes as-of-accepted
    rows whose pod_id is only the tag cache key — diverging from the
    i_full-based definition the pipeline reports)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.metrics import _counters

    obs = Observation("k8s_meta_stats")
    df = df.observe(obs, *[v.alias(k) for k, v in _counters().items()])
    return df, obs
