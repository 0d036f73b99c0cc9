"""Executable spec of the enrichment branch semantics, written directly
from kubernetes_metadata_cache_strategy.rb:24-102 and
filter_kubernetes_metadata.rb:324-362 (NOT from enrich.py — this is the
independent model the Spark implementation is differential-tested
against in test_property_enrich.py)."""

from __future__ import annotations

import re

PODS_RX = re.compile(
    r"(var\.log\.pods)\.(?P<namespace>[^_]+)_"
    r"(?P<pod_name>[a-z0-9]([-a-z0-9]*[a-z0-9])?(\.[a-z0-9]([-a-z0-9]*[a-z0-9])?)*)_"
    r"(?P<pod_uuid>[a-z0-9-]*)\.(?P<container_name>.+)\..*\.log$"
)
CONT_RX = re.compile(
    r"(var\.log\.containers)\."
    r"(?P<pod_name>[a-z0-9]([-a-z0-9]*[a-z0-9])?(\.[a-z0-9]([-a-z0-9]*[a-z0-9])?)*)_"
    r"(?P<namespace>[^_]+)_(?P<container_name>.+)-(?P<docker_id>[a-z0-9]{64})\.log$"
)

PREFIX_RX = re.compile(r"^[-_a-zA-Z0-9]+://")


def model_enrich(tool, ts, pods, namespaces, cfg):
    """pods: {(ns, pod): {...}}, namespaces: {ns: {...}}. Returns the
    flat enrichment dict (absent == omitted), mirroring ENRICHED_COLS."""
    out = {}
    m = PODS_RX.search(tool or "")
    branch = "pods" if m else None
    if not m:
        m = CONT_RX.search(tool or "")
        branch = "containers" if m else None
    if not m:
        return out

    ns_name = m.group("namespace")
    pod_name = m.group("pod_name")
    container = m.group("container_name")
    docker_id = m.group("docker_id") if branch == "containers" else None
    cache_key = m.group("pod_uuid") if branch == "pods" else docker_id

    out["namespace_name"] = ns_name
    out["pod_name"] = pod_name
    out["container_name"] = container
    if docker_id:
        out["docker_container_id"] = docker_id

    if cfg.kubernetes_url is None:
        # filter:337 — get_pod_metadata is url-gated; base identity +
        # docker id above are not
        if out.get("docker_container_id") in (None, ""):
            out.pop("docker_container_id", None)
        return out

    pod = pods.get((ns_name, pod_name))
    ns = None if cfg.skip_namespace_metadata else namespaces.get(ns_name)

    def add_ns_meta():
        out["namespace_id"] = ns["namespace_id"]
        if ns.get("labels") and not (cfg.skip_labels or cfg.skip_namespace_labels):
            out["namespace_labels"] = dict(ns["labels"])
        anns = _match_annotations(ns.get("annotations") or {}, cfg)
        if anns:
            out["namespace_annotations"] = anns

    if cfg.skip_namespace_metadata:
        if pod is not None:
            _add_pod_meta(out, pod, container, cfg)
        return out

    if pod is not None and ns is not None:
        _add_pod_meta(out, pod, container, cfg)
        add_ns_meta()
    elif pod is None and ns is not None:
        # as-of branch (cache_strategy.rb:46-57)
        if ns["creation_timestamp"] <= ts:
            out["pod_id"] = cache_key
        add_ns_meta()
    else:
        # ns missing (pod found or not) -> orphan (cache_strategy.rb:58-79)
        if cfg.allow_orphans:
            out["orphaned_namespace"] = ns_name
            out["namespace_name"] = cfg.orphaned_namespace_name
            out["namespace_id"] = cfg.orphaned_namespace_id
    if out.get("docker_container_id") in (None, ""):
        out.pop("docker_container_id", None)
    return out


def _match_annotations(annotations, cfg):
    if not cfg.annotation_match:
        return {}
    keep = {}
    for k, v in annotations.items():
        if any(re.search(p, k) for p in cfg.annotation_match):
            keep[k] = v
    return keep


def _add_pod_meta(out, pod, container, cfg):
    out["pod_id"] = pod["pod_id"]
    if pod.get("pod_ip") is not None:
        out["pod_ip"] = pod["pod_ip"]
    if pod.get("host") is not None:
        out["host"] = pod["host"]
    if not cfg.skip_master_url:
        out["master_url"] = cfg.kubernetes_url
    if pod.get("labels") and not (cfg.skip_labels or cfg.skip_pod_labels):
        out["labels"] = dict(pod["labels"])
    anns = _match_annotations(pod.get("annotations") or {}, cfg)
    if anns:
        out["annotations"] = anns
    if cfg.include_ownerrefs_metadata:
        out["ownerrefs"] = [tuple(sorted(o.items())) for o in pod.get("ownerrefs") or []]
    status = None
    for c in pod.get("containers") or []:
        if c["name"] == container:
            status = c
            break
    if status is not None and not cfg.skip_container_metadata:
        out["container_image"] = status["image"]
        if status["image_id"]:
            out["container_image_id"] = status["image_id"]
        cid = PREFIX_RX.sub("", status["container_id"] or "")
        if cid:
            out["docker_container_id"] = cid
