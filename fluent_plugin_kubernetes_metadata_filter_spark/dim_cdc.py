"""Incremental dimension CDC: the watch-MODIFIED upsert as a Spark merge
(SURVEY.md O24 full form).

The reference applies watch notices one at a time to its LRU cache
(kubernetes_metadata_watch_pods.rb:168-181): a MODIFIED notice for a
cached uid replaces the entry (pod_cache_watch_updates), an uncached uid
is inserted only when the pod is scheduled on THIS node
(ENV['K8S_NODE_NAME'] == spec.nodeName, :176-178 — the same node scope
the initial list uses via field_selector, :132), otherwise it is a
watch miss; DELETED notices are ignored so late log lines still enrich
(:182-186) and eviction is TTL-based (io.dim_with_ttl, O25).

The Spark re-expression is a set-based merge over a dim snapshot plus a
batch of update rows — exactly the plan ``MERGE INTO dim USING updates
ON key WHEN MATCHED THEN UPDATE WHEN NOT MATCHED AND node_gate THEN
INSERT`` compiles to. Iceberg runtime jars are not installable in this
sandbox (no network; see BASELINE.md), so the merge is expressed
directly as union + per-key latest-wins dedupe; on an Iceberg
deployment the same statement runs as a real MERGE INTO and this module
is the contract test for it.

Scale notes: one shuffle keyed by the dim key over dim-sized data
(O(10^4) rows — trivial next to the event stream); the update batch is
typically far smaller than the snapshot, and the output feeds the
broadcast join in enrich(), so the event path stays shuffle-free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def apply_dim_updates(current: DataFrame, updates: DataFrame,
                      key_cols: list[str] | None = None,
                      node_name: str | None = None,
                      node_col: str = "host",
                      version_col: str | None = None) -> DataFrame:
    """Merge a batch of watch-MODIFIED rows into a dim snapshot.

    - a key present in both: the update row wins (watch update,
      watch_pods.rb:168-172);
    - a key only in ``updates``: inserted only when ``node_name`` is
      None (no node scoping) or the row's ``node_col`` matches
      (:176-178); otherwise dropped (the watch-miss path, :179-180);
    - a key only in ``current``: retained — deletions are never applied
      here (:182-186), they age out via io.dim_with_ttl (O25).

    The reference applies notices SEQUENTIALLY, so when one batch holds
    several notices for a key the latest wins. Set-based application
    needs an explicit order: pass ``version_col`` (resourceVersion / an
    update timestamp — both monotone per key in a watch stream) and the
    highest version wins — ACROSS the snapshot and the batch, so a
    stale update replayed after a snapshot refresh cannot regress the
    dim; at equal version the update row wins (it is the later notice).
    Without ``version_col``, update batches MUST be pre-deduped per
    key — the winner among same-key update rows is otherwise arbitrary.

    Column sets must match (unionByName). Returns the merged snapshot.
    """
    if key_cols is None:
        key_cols = ["namespace_name", "pod_name"]
    cur = current.withColumn("_src", F.lit(0))
    upd = updates.withColumn("_src", F.lit(1))
    both = cur.unionByName(upd)
    w = Window.partitionBy(*key_cols)
    # version (when present) ranks FIRST: a fresher snapshot row must
    # beat a stale replayed update; _src breaks equal-version ties in
    # the update's favor
    order = [F.desc("_src")] if version_col is None else [F.desc(version_col), F.desc("_src")]
    merged = (
        both.withColumn("_rn", F.row_number().over(w.orderBy(*order)))
        .withColumn("_existed", F.max(F.when(F.col("_src") == 0, 1).otherwise(0)).over(w))
    )
    keep = F.col("_rn") == 1
    if node_name is not None:
        keep = keep & ((F.col("_existed") == 1) | (F.col(node_col) == node_name))
    return merged.where(keep).drop("_src", "_rn", "_existed")


def _read_updates(spark, path: str):
    """Read an update batch; None when the batch doesn't exist yet.

    ONLY the path-missing case is treated as "no update batch" — a
    corrupt batch file, a schema drift, or a permission error must
    PROPAGATE so enrich_stream's {kind}_watch_failures counter fires
    (the reference distinguishes exactly these paths: a watch that
    yields nothing vs a watch that errors, watch_pods.rb:57-111)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if (e.getCondition() or "") == "PATH_NOT_FOUND":
            return None
        raise


def cdc_dims_loader(spark, pods_snapshot_path: str, ns_snapshot_path: str,
                    pods_updates_path: str | None = None,
                    ns_updates_path: str | None = None,
                    node_name: str | None = None,
                    version_col: str | None = None):
    """dims_loader for streaming.enrich_stream that applies pending
    update batches on top of base snapshots each micro-batch — the
    delta-apply alternative to re-reading the full dim (cheaper when
    the dim is large and the delta small; on Iceberg this becomes an
    incremental scan between snapshot ids)."""

    def load():
        pods = spark.read.parquet(pods_snapshot_path)
        ns = spark.read.parquet(ns_snapshot_path)
        if pods_updates_path:
            upd = _read_updates(spark, pods_updates_path)
            if upd is not None:
                pods = apply_dim_updates(pods, upd, node_name=node_name,
                                         version_col=version_col)
        if ns_updates_path:
            upd = _read_updates(spark, ns_updates_path)
            if upd is not None:
                ns = apply_dim_updates(ns, upd, key_cols=["namespace_name"],
                                       version_col=version_col)
        return pods, ns

    return load
