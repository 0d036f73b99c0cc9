"""Golden scenario matrix (FIXTURES.md section 5) — each case mirrors a
reference test, cited inline. Assertions are whole-row golden-equality
like the reference's assert_equal on the full output hash
(test/plugin/test_filter_kubernetes_metadata.rb:380-415)."""

from datetime import datetime

import pyspark.sql.functions as F

from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig
from fluent_plugin_kubernetes_metadata_filter_spark.enrich import enrich
from tests.conftest import (
    CONTAINER,
    DOCKER_ID,
    EVENT_TIME,
    IMAGE,
    IMAGE_ID,
    MASTER_URL,
    NS_UID,
    POD_IP,
    POD_NAME,
    POD_UID,
    TAG_CONTAINERS,
    TAG_PODS,
    enriched_row,
    transcript,
)

CFG = PipelineConfig(kubernetes_url=MASTER_URL)


def run(spark, pods_dim, ns_dim, tag, cfg=CFG, ts=EVENT_TIME, extra=None):
    df = transcript(spark, tag, ts=ts)
    if extra:
        df = df.withColumns({k: F.lit(v) for k, v in extra.items()})
    return enriched_row(enrich(df, pods_dim, ns_dim, cfg))


FULL_HIT = {
    # test_filter_kubernetes_metadata.rb:380-415 (full enrichment)
    "namespace_name": "default",
    "pod_name": POD_NAME,
    "container_name": CONTAINER,
    "pod_id": POD_UID,
    "pod_ip": POD_IP,
    "host": "jimmi-redhat.localnet",
    "master_url": MASTER_URL,
    "namespace_id": NS_UID,
    "container_image": IMAGE,
    "container_image_id": IMAGE_ID,
    # containerID wins over the tag docker id, stripped of docker://
    # (filter:345-348; common.rb:64)
    "docker_container_id": DOCKER_ID,
    "labels": {"component": "fabric8Console"},
    "namespace_labels": {"tenant": "test"},
}


def test_full_enrichment_containers_tag(spark, pods_dim, ns_dim):
    assert run(spark, pods_dim, ns_dim, TAG_CONTAINERS) == FULL_HIT


def test_full_enrichment_pods_tag(spark, pods_dim, ns_dim):
    # test_filter:229-263 — /var/log/pods variant: no tag docker id, but
    # container correlation still supplies container_id
    assert run(spark, pods_dim, ns_dim, TAG_PODS) == FULL_HIT


def test_orphan_both_missing(spark, pods_dim, ns_dim):
    # cache_strategy.rb:58-79; test_filter:535-558
    tag = f"var.log.containers.nopod-1_missingns_c-{DOCKER_ID}.log"
    assert run(spark, pods_dim, ns_dim, tag) == {
        "namespace_name": ".orphaned",
        "pod_name": "nopod-1",
        "container_name": "c",
        "orphaned_namespace": "missingns",
        "namespace_id": "orphaned",
        "docker_container_id": DOCKER_ID,
    }


def test_orphan_pod_found_ns_missing(spark, pods_dim, ns_dim):
    # cache_strategy.rb:60-66 — pod metadata is discarded, row orphans
    tag = f"var.log.containers.stray-pod_ghost-ns_main-{DOCKER_ID}.log"
    assert run(spark, pods_dim, ns_dim, tag) == {
        "namespace_name": ".orphaned",
        "pod_name": "stray-pod",
        "container_name": "main",
        "orphaned_namespace": "ghost-ns",
        "namespace_id": "orphaned",
        "docker_container_id": DOCKER_ID,
    }


def test_orphans_disabled(spark, pods_dim, ns_dim):
    # allow_orphans false -> {} metadata -> base identity only
    # (cache_strategy.rb:75-77; reference benchmark config kube-01-01)
    tag = f"var.log.containers.nopod-1_missingns_c-{DOCKER_ID}.log"
    cfg = CFG.with_(allow_orphans=False)
    assert run(spark, pods_dim, ns_dim, tag, cfg) == {
        "namespace_name": "missingns",
        "pod_name": "nopod-1",
        "container_name": "c",
        "docker_container_id": DOCKER_ID,
    }


def test_custom_orphan_values(spark, pods_dim, ns_dim):
    tag = f"var.log.containers.nopod-1_missingns_c-{DOCKER_ID}.log"
    cfg = CFG.with_(orphaned_namespace_name="lost+found", orphaned_namespace_id="0")
    r = run(spark, pods_dim, ns_dim, tag, cfg)
    assert r["namespace_name"] == "lost+found"
    assert r["namespace_id"] == "0"


def test_asof_accept_pod_missing_old_ns(spark, pods_dim, ns_dim):
    # cache_strategy.rb:49-56; test_cache_strategy.rb:104-116 —
    # ns older than the record: pod_id := cache key, ns metadata kept
    tag = f"var.log.containers.vanished-pod_default_c-{DOCKER_ID}.log"
    assert run(spark, pods_dim, ns_dim, tag) == {
        "namespace_name": "default",
        "pod_name": "vanished-pod",
        "container_name": "c",
        "pod_id": DOCKER_ID,  # the cache key (docker id for containers tags)
        "namespace_id": NS_UID,
        "namespace_labels": {"tenant": "test"},
        "docker_container_id": DOCKER_ID,
    }


def test_asof_accept_uses_pod_uuid_for_pods_tag(spark, pods_dim, ns_dim):
    tag = f"var.log.pods.default_vanished-pod_{POD_UID}.c.0.log"
    r = run(spark, pods_dim, ns_dim, tag)
    assert r["pod_id"] == POD_UID
    assert "docker_container_id" not in r  # no docker id anywhere


def test_asof_reject_pod_missing_future_ns(spark, pods_dim, ns_dim):
    # test_cache_strategy.rb:118-128 — ns NEWER than record: ns metadata
    # only, NO pod_id
    tag = f"var.log.containers.vanished-pod_newns_c-{DOCKER_ID}.log"
    assert run(spark, pods_dim, ns_dim, tag) == {
        "namespace_name": "newns",
        "pod_name": "vanished-pod",
        "container_name": "c",
        "namespace_id": "future-ns-uid-01",
        "namespace_labels": {"tenant": "new"},
        "docker_container_id": DOCKER_ID,
    }


def test_asof_boundary_equal_time_accepts(spark, pods_dim, ns_dim):
    # ns_time <= record time accepts (cache_strategy.rb:50 uses <=)
    tag = f"var.log.containers.vanished-pod_newns_c-{DOCKER_ID}.log"
    r = run(spark, pods_dim, ns_dim, tag, ts=datetime(2030, 1, 1, 0, 0, 0))
    assert r["pod_id"] == DOCKER_ID


def test_passthrough_non_matching(spark, pods_dim, ns_dim):
    # test_filter:586-600 — record unchanged, no metadata at all
    df = transcript(spark, "non-kubernetes")
    out = enrich(df, pods_dim, ns_dim, CFG)
    r = enriched_row(out)
    assert r == {}
    # and the original input columns survive untouched
    row = out.collect()[0]
    assert row.text == "hello world" and row.tool == "non-kubernetes"


def test_enrichment_disabled_without_url(spark, pods_dim, ns_dim):
    # filter:326-337 — no kubernetes_url: base identity fields and the
    # tag docker id are still emitted on a tag match (only the
    # get_pod_metadata dim lookup is url-gated); no dim fields, no orphan
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, PipelineConfig(kubernetes_url=None))
    assert r == {
        "namespace_name": "default",
        "pod_name": POD_NAME,
        "container_name": CONTAINER,
        "docker_container_id": DOCKER_ID,
    }


def test_init_container_empty_ids_omitted(spark, pods_dim, ns_dim):
    # kubernetes_get_pod_container_init.yml:126-139 — empty imageID and
    # containerID must be omitted; docker struct dropped entirely for a
    # pods-form tag (no docker id available at all)
    tag = f"var.log.pods.default_init-pod_init-pod-uid-0001.init-container.0.log"
    r = run(spark, pods_dim, ns_dim, tag)
    assert r["container_image"] == "busybox:latest"
    assert "container_image_id" not in r
    assert "docker_container_id" not in r
    assert "labels" not in r  # empty labels hash omitted (common.rb:105-107)


def test_init_container_keeps_tag_docker_id(spark, pods_dim, ns_dim):
    # containers-form tag: empty containerID correlation must NOT clobber
    # the tag-derived docker id (filter:345-348 only overrides non-empty)
    tag = f"var.log.containers.init-pod_default_init-container-{DOCKER_ID}.log"
    r = run(spark, pods_dim, ns_dim, tag)
    assert r["docker_container_id"] == DOCKER_ID


def test_container_not_in_statuses(spark, pods_dim, ns_dim):
    # container name not present in containerStatuses -> no image fields
    tag = f"var.log.containers.{POD_NAME}_default_other-container-{DOCKER_ID}.log"
    r = run(spark, pods_dim, ns_dim, tag)
    assert "container_image" not in r
    assert r["docker_container_id"] == DOCKER_ID
    assert r["pod_id"] == POD_UID


def test_dotted_pod_enrichment(spark, pods_dim, ns_dim):
    # test_filter:560-584
    tag = (
        f"var.log.containers.fabric8-console-controller.98rqc_default_{CONTAINER}-{DOCKER_ID}.log"
    )
    r = run(spark, pods_dim, ns_dim, tag)
    assert r["pod_name"] == "fabric8-console-controller.98rqc"
    assert r["pod_id"] == POD_UID


def test_annotation_match(spark, pods_dim, ns_dim):
    # test_filter:602-725 — keep annotations whose key matches any regex
    cfg = CFG.with_(annotation_match=("custom.+",))
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, cfg)
    assert r["annotations"] == {"custom.field1": "curiosity"}
    cfg2 = CFG.with_(annotation_match=("custom.+", "^field"))
    r2 = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, cfg2)
    assert r2["annotations"] == {"custom.field1": "curiosity", "field.two": "killed_the_cat"}
    # namespace annotations filtered by the same regexes (common.rb:42)
    cfg3 = CFG.with_(annotation_match=("workspaceId",))
    r3 = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, cfg3)
    assert r3["namespace_annotations"] == {"workspaceId": "myWorkspaceName"}
    assert "annotations" not in r3  # no pod annotation key matches


def test_annotations_omitted_by_default(spark, pods_dim, ns_dim):
    # default annotation_match=[] -> match_annotations returns {} ->
    # annotations never emitted (common.rb:30-38,49-51)
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS)
    assert "annotations" not in r
    assert "namespace_annotations" not in r


def test_skip_labels(spark, pods_dim, ns_dim):
    # test_filter:779-811
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, CFG.with_(skip_labels=True))
    assert "labels" not in r
    assert "namespace_labels" not in r


def test_skip_pod_labels_only(spark, pods_dim, ns_dim):
    # test_filter:813-889
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, CFG.with_(skip_pod_labels=True))
    assert "labels" not in r
    assert r["namespace_labels"] == {"tenant": "test"}


def test_skip_namespace_labels_only(spark, pods_dim, ns_dim):
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, CFG.with_(skip_namespace_labels=True))
    assert r["labels"] == {"component": "fabric8Console"}
    assert "namespace_labels" not in r


def test_skip_container_metadata(spark, pods_dim, ns_dim):
    # test_filter:779-811 — no image fields; tag docker id preserved
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, CFG.with_(skip_container_metadata=True))
    assert "container_image" not in r
    assert "container_image_id" not in r
    assert r["docker_container_id"] == DOCKER_ID


def test_skip_master_url(spark, pods_dim, ns_dim):
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, CFG.with_(skip_master_url=True))
    assert "master_url" not in r


def test_skip_namespace_metadata(spark, pods_dim, ns_dim):
    # cache_strategy.rb:34-38 — pod metadata only; no ns join, and the
    # orphan branch is unreachable
    cfg = CFG.with_(skip_namespace_metadata=True)
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, cfg)
    assert "namespace_id" not in r
    assert "namespace_labels" not in r
    assert r["pod_id"] == POD_UID
    # pod miss under skip_namespace_metadata -> base identity only
    tag = f"var.log.containers.nopod-1_missingns_c-{DOCKER_ID}.log"
    r2 = run(spark, pods_dim, ns_dim, tag, cfg)
    assert r2 == {
        "namespace_name": "missingns",
        "pod_name": "nopod-1",
        "container_name": "c",
        "docker_container_id": DOCKER_ID,
    }


def test_ownerrefs(spark, pods_dim, ns_dim):
    # test_filter:891-933 — only when include_ownerrefs_metadata
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS)
    assert "ownerrefs" not in r
    cfg = CFG.with_(include_ownerrefs_metadata=True)
    r2 = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, cfg)
    assert r2["ownerrefs"] == [
        (("kind", "ReplicaSet"), ("name", "fabric8-console-controller"))
    ]


def test_record_override_enriches_from_record_identity(spark, pods_dim, ns_dim):
    # filter:384-399 — record-carried identity drives the lookup
    r = run(
        spark,
        pods_dim,
        ns_dim,
        "non-kubernetes",
        extra={
            "k8s_namespace_name": "default",
            "k8s_pod_name": POD_NAME,
            "k8s_container_name": CONTAINER,
            "docker_container_id": "some-other-id",
        },
    )
    assert r["pod_id"] == POD_UID
    assert r["namespace_id"] == NS_UID
    # correlated containerID (non-empty) still wins over the record id
    assert r["docker_container_id"] == DOCKER_ID


def test_de_dot_rewrites_map_keys(spark, pods_dim, ns_dim):
    # historical de_dot contract (deprecated in 3.7.1, release_notes.md:4):
    # '.' in label/annotation KEYS -> separator; values untouched
    cfg = CFG.with_(de_dot=True, annotation_match=("custom.+", "field"))
    r = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, cfg)
    assert r["annotations"] == {"custom_field1": "curiosity", "field_two": "killed_the_cat"}
    assert r["labels"] == {"component": "fabric8Console"}  # no dots -> unchanged
    # default: off (3.7.1 behavior)
    r2 = run(spark, pods_dim, ns_dim, TAG_CONTAINERS, CFG.with_(annotation_match=("custom.+",)))
    assert r2["annotations"] == {"custom.field1": "curiosity"}


def test_custom_tag_regex_override(spark, pods_dim, ns_dim):
    # tag_to_kubernetes_name_regexp analogue (filter:66-67): custom
    # patterns replace the defaults; fast path falls back to regex
    custom = (
        r"k8s\.(?<namespace>[^/]+)/(?<pod_name>[a-z0-9-]+)/"
        r"(?<container_name>[a-z0-9-]+)-(?<docker_id>[a-z0-9]{64})\.log$"
    )
    cfg = CFG.with_(regex_var_log_containers=custom,
                    regex_var_log_pods=r"(?<namespace>x)_(?<pod_name>y)_(?<pod_uuid>z)\.(?<container_name>w)\.nomatch$")
    tag = f"k8s.default/{POD_NAME}/{CONTAINER}-{DOCKER_ID}.log"
    r = run(spark, pods_dim, ns_dim, tag, cfg)
    assert r["pod_id"] == POD_UID
    assert r["namespace_name"] == "default"


def test_map_str_prefix_keys_sort_by_key(spark):
    """Map rendering sorts by KEY (the oracle's string_agg ORDER BY
    key). Sorting the concatenated 'k=v' strings would flip any
    prefix-pair — 'app' vs 'app.kubernetes.io/name' ('=' 0x3D sorts
    after '.' 0x2E) — and hash-mismatch the oracle."""
    import pyspark.sql.functions as F

    from fluent_plugin_kubernetes_metadata_filter_spark.queries import _map_str

    df = spark.createDataFrame(
        [({"app": "x", "app.kubernetes.io/name": "y"},)], "m map<string,string>"
    )
    out = df.select(_map_str(F.col("m")).alias("s")).collect()[0].s
    assert out == "app=x,app.kubernetes.io/name=y"
