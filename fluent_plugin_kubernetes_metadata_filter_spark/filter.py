"""User-facing facade mirroring the reference plugin's API shape.

A fluentd user configures ``<filter>@type kubernetes_metadata`` with
config params and gets back enriched records; the Spark analogue is one
object holding the same params whose ``filter`` maps a DataFrame of
events to the enriched DataFrame:

    enricher = KubernetesMetadataFilter(
        pods_dim, namespaces_dim,
        annotation_match=["custom.+"], skip_labels=False,
    )
    enriched = enricher.filter(transcripts_df)      # flat columns
    emitted  = enricher.emit(transcripts_df)        # nested kubernetes/docker structs

Every keyword mirrors a reference ``config_param``
(filter_kubernetes_metadata.rb:44-99); see config.PipelineConfig for the
mapping table and defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig
from fluent_plugin_kubernetes_metadata_filter_spark.enrich import assemble_structs, enrich
from fluent_plugin_kubernetes_metadata_filter_spark.metrics import PipelineStats


class KubernetesMetadataFilter:
    """The ``filter(tag, time, record)`` hot path (filter:364-403),
    batch-vectorized: tag == source_col, time == ts_col, record == row."""

    def __init__(self, pods_dim: DataFrame, namespaces_dim: DataFrame,
                 source_col: str = "tool", ts_col: str = "ts", **config):
        self.cfg = PipelineConfig(**config) if config else PipelineConfig()
        self.pods_dim = pods_dim
        self.namespaces_dim = namespaces_dim
        self.source_col = source_col
        self.ts_col = ts_col
        self.stats = PipelineStats()

    def filter(self, df: DataFrame, observe: bool = False) -> DataFrame:
        """Enrich; adds the flat ENRICHED_COLS (null == omitted)."""
        out = enrich(
            df,
            self.pods_dim,
            self.namespaces_dim,
            self.cfg,
            ts_col=self.ts_col,
            source_col=self.source_col,
        )
        if observe:
            out = self.stats.attach(out)
        return out

    def emit(self, df: DataFrame, observe: bool = False) -> DataFrame:
        """Enrich and assemble the nested kubernetes/docker sub-records
        (the record.merge(metadata) contract, filter:402)."""
        return assemble_structs(self.filter(df, observe=observe))

    def dump_stats(self) -> dict:
        """O23 stats dump; call after an action on an observed frame."""
        return self.stats.dump()
