"""O24 full form: watch-MODIFIED delta-apply merge semantics
(watch_pods.rb:168-186) + the Iceberg-fallback snapshot contract."""

import os
import time

import pyspark.sql.functions as F

from fluent_plugin_kubernetes_metadata_filter_spark.checkpoint import input_snapshot_id
from fluent_plugin_kubernetes_metadata_filter_spark.dim_cdc import apply_dim_updates
from fluent_plugin_kubernetes_metadata_filter_spark.io import try_iceberg_table


def _dim(spark, rows):
    return spark.createDataFrame(rows, "namespace_name string, pod_name string, host string, pod_ip string")


def test_modified_updates_existing_key(spark):
    cur = _dim(spark, [("ns", "a", "node-1", "10.0.0.1"), ("ns", "b", "node-2", "10.0.0.2")])
    upd = _dim(spark, [("ns", "a", "node-1", "10.9.9.9")])
    out = {(r.namespace_name, r.pod_name): r.pod_ip for r in apply_dim_updates(cur, upd).collect()}
    assert out == {("ns", "a"): "10.9.9.9", ("ns", "b"): "10.0.0.2"}


def test_new_key_gated_by_node_scope(spark):
    """Uncached uid: inserted only when scheduled on this node
    (watch_pods.rb:176-180); other-node rows are the watch-miss path."""
    cur = _dim(spark, [("ns", "a", "node-1", "10.0.0.1")])
    upd = _dim(spark, [("ns", "new-here", "node-1", "10.0.0.7"),
                       ("ns", "new-elsewhere", "node-9", "10.0.0.8")])
    out = {r.pod_name for r in apply_dim_updates(cur, upd, node_name="node-1").collect()}
    assert out == {"a", "new-here"}
    # no node scoping -> both inserted
    out2 = {r.pod_name for r in apply_dim_updates(cur, upd).collect()}
    assert out2 == {"a", "new-here", "new-elsewhere"}


def test_node_scope_does_not_block_updates_to_cached_keys(spark):
    """A MODIFIED notice for a cached key applies even if the pod moved
    to another node (the cached branch has no node gate, :168-172)."""
    cur = _dim(spark, [("ns", "a", "node-1", "10.0.0.1")])
    upd = _dim(spark, [("ns", "a", "node-9", "10.1.1.1")])
    out = apply_dim_updates(cur, upd, node_name="node-1").collect()
    assert len(out) == 1 and out[0].host == "node-9" and out[0].pod_ip == "10.1.1.1"


def test_deletes_never_applied(spark):
    """A key absent from the update batch is retained (DELETED notices
    are ignored, :182-186; eviction is TTL-based, O25)."""
    cur = _dim(spark, [("ns", "a", "node-1", "10.0.0.1"), ("ns", "b", "node-2", "10.0.0.2")])
    upd = _dim(spark, [])
    assert apply_dim_updates(cur, upd).count() == 2


def test_version_ordering_within_batch(spark):
    """Several MODIFIED notices for one key in a single batch: the
    highest version wins (the reference applies notices sequentially,
    so the latest wins; set-based application orders on version_col)."""
    cur = spark.createDataFrame(
        [("ns", "a", "node-1", "10.0.0.1", 1)],
        "namespace_name string, pod_name string, host string, pod_ip string, version long",
    )
    upd = spark.createDataFrame(
        [("ns", "a", "node-1", "10.2.2.2", 5), ("ns", "a", "node-1", "10.3.3.3", 9),
         ("ns", "a", "node-1", "10.1.1.1", 3)],
        "namespace_name string, pod_name string, host string, pod_ip string, version long",
    )
    out = apply_dim_updates(cur, upd, version_col="version").collect()
    assert len(out) == 1 and out[0].pod_ip == "10.3.3.3" and out[0].version == 9


def test_version_ordering_snapshot_beats_stale_replay(spark):
    """A snapshot refreshed at a HIGHER version must not be regressed by
    a stale update batch replayed afterwards (the batch stays on the
    updates path until rotation, so it re-applies every micro-batch):
    version ranks before source. At EQUAL version the update wins — it
    is the later notice."""
    cur = spark.createDataFrame(
        [("ns", "a", "node-1", "10.9.9.9", 100), ("ns", "b", "node-1", "10.0.0.5", 50)],
        "namespace_name string, pod_name string, host string, pod_ip string, version long",
    )
    upd = spark.createDataFrame(
        [("ns", "a", "node-1", "10.0.0.1", 50),   # stale replay: loses
         ("ns", "b", "node-1", "10.7.7.7", 50)],  # equal version: update wins
        "namespace_name string, pod_name string, host string, pod_ip string, version long",
    )
    out = {r.pod_name: r for r in apply_dim_updates(cur, upd, version_col="version").collect()}
    assert out["a"].pod_ip == "10.9.9.9" and out["a"].version == 100
    assert out["b"].pod_ip == "10.7.7.7"


def test_cdc_loader_corrupt_updates_raise(spark, tmp_path):
    """A corrupt update batch must RAISE (-> watch_failures), not
    silently serve stale dims; only a missing batch means 'no updates
    yet'. A schema-drifted batch must raise too."""
    import pytest

    from fluent_plugin_kubernetes_metadata_filter_spark.dim_cdc import cdc_dims_loader

    snap = str(tmp_path / "pods")
    ns_snap = str(tmp_path / "ns")
    _dim(spark, [("ns", "a", "node-1", "10.0.0.1")]).write.parquet(snap)
    spark.createDataFrame([("ns",)], "namespace_name string").write.parquet(ns_snap)

    # missing updates path -> fine, snapshot served
    load = cdc_dims_loader(spark, snap, ns_snap,
                           pods_updates_path=str(tmp_path / "never-written"))
    pods, _ = load()
    assert pods.count() == 1

    # corrupt updates file -> propagates
    bad = tmp_path / "bad-updates"
    bad.mkdir()
    (bad / "part-0.parquet").write_bytes(b"junk, not parquet")
    load_bad = cdc_dims_loader(spark, snap, ns_snap, pods_updates_path=str(bad))
    with pytest.raises(Exception):
        p, _ = load_bad()
        p.count()

    # schema drift (missing merge columns) -> propagates at plan time
    drift = str(tmp_path / "drift-updates")
    spark.createDataFrame([("x",)], "unrelated string").write.parquet(drift)
    load_drift = cdc_dims_loader(spark, snap, ns_snap, pods_updates_path=drift)
    with pytest.raises(Exception):
        p, _ = load_drift()
        p.count()


def test_cdc_dims_loader_with_enrich_stream(spark, tmp_path):
    """Delta-apply loader end-to-end: a pod update batch written between
    micro-batches changes the dim the stream enriches with, and
    WatchStats records it as a watch update."""
    from fluent_plugin_kubernetes_metadata_filter_spark import streaming
    from fluent_plugin_kubernetes_metadata_filter_spark.dim_cdc import cdc_dims_loader
    from fluent_plugin_kubernetes_metadata_filter_spark.io import aux_dir

    base = aux_dir("/root/testdata/sf0.001")
    src = spark.read.parquet(f"{base}/transcripts.parquet").limit(100)
    d = str(tmp_path / "in")
    src.where(F.col("turn_idx") % 2 == 0).coalesce(1).write.parquet(d)
    src.where(F.col("turn_idx") % 2 == 1).coalesce(1).write.mode("append").parquet(d)
    stream = spark.readStream.schema(src.schema).option("maxFilesPerTrigger", 1).parquet(d)

    upd_dir = str(tmp_path / "pod-updates")
    pods0 = spark.read.parquet(f"{base}/pods_dim.parquet")
    first_batch_done = {"v": False}

    loader = cdc_dims_loader(
        spark, f"{base}/pods_dim.parquet", f"{base}/namespaces_dim.parquet",
        pods_updates_path=upd_dir,
    )

    def wrapped():
        if first_batch_done["v"] and not os.path.exists(upd_dir):
            # write an update batch between micro-batches
            pods0.limit(1).withColumn("host", F.lit("cdc-moved")).write.parquet(upd_dir)
        pods, ns = loader()
        first_batch_done["v"] = True
        return pods, ns

    stats = streaming.WatchStats()
    hosts = []
    q = streaming.enrich_stream(
        stream, wrapped,
        lambda df, bid: hosts.append({r.host for r in df.select("host").where(F.col("host").isNotNull()).collect()}),
        watch_stats=stats,
    )
    q.awaitTermination(120)
    assert len(hosts) >= 2
    assert stats.counters.get("pod_cache_watch_updates", 0) >= 1


# ---------------------------------------------- Iceberg fallback contract

def test_try_iceberg_table_fallback_is_deterministic(spark):
    """No Iceberg runtime in this sandbox (no network for jars): the
    reader must return None — never raise — so callers always take the
    parquet path; see BASELINE.md 'Iceberg blocker'."""
    assert try_iceberg_table(spark, "nosuch.catalog.table") is None


def test_input_snapshot_id_contract(spark, tmp_path):
    """Parquet fallback for the Iceberg snapshot id: stable across calls,
    sensitive to any parquet file change, blind to non-parquet noise."""
    d = str(tmp_path / "snap")
    spark.range(10).coalesce(1).write.parquet(d)
    s1 = input_snapshot_id(spark, d)
    assert s1 == input_snapshot_id(spark, d)
    # non-parquet files don't change the snapshot
    with open(os.path.join(d, "notes.txt"), "w") as fh:
        fh.write("x")
    assert input_snapshot_id(spark, d) == s1
    # any parquet mutation does
    pq = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    t = time.time() + 5
    os.utime(os.path.join(d, pq), (t, t))
    assert input_snapshot_id(spark, d) != s1
