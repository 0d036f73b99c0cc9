"""Differential test: the Spark enrichment vs the executable spec model
(tests/reference_model.py) over randomized dims, tags, configs, and
timestamps. One Spark job per config (all rows batched), row-by-row
comparison. Random content is seeded — failures reproduce."""

import random
from datetime import datetime, timedelta

import pytest

from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig
from fluent_plugin_kubernetes_metadata_filter_spark.enrich import ENRICHED_COLS, enrich
from tests.conftest import NS_SCHEMA, PODS_SCHEMA, TRANSCRIPT_SCHEMA
from tests.reference_model import model_enrich

BASE_TS = datetime(2024, 1, 1)


def _gen_world(rng):
    namespaces = {}
    for i in range(rng.randint(3, 8)):
        name = f"ns{i}"
        namespaces[name] = {
            "namespace_id": f"nsid-{i}",
            "labels": {} if rng.random() < 0.3 else {"team": f"t{i % 3}", "x.y": "z"},
            "annotations": {}
            if rng.random() < 0.3
            else {"workspaceId": f"w{i}", "custom.k": f"v{i}", "other": "o"},
            "creation_timestamp": BASE_TS + timedelta(days=rng.randint(-400, 400)),
        }
    missing_ns = [f"ghost{i}" for i in range(2)]

    pods = {}
    all_ns = list(namespaces) + missing_ns
    for i in range(rng.randint(4, 12)):
        nsn = all_ns[rng.randrange(len(all_ns))]
        pod = f"pod-{i}" if rng.random() < 0.7 else f"pod.{i}.dot"
        containers = []
        for c in range(rng.randint(1, 3)):
            empty = rng.random() < 0.25
            containers.append(
                {
                    "name": f"c{c}",
                    "image": f"img/{i}:{c}",
                    "image_id": "" if empty else f"docker-pullable://img@sha256:{i}{c}",
                    "container_id": "" if empty else f"docker://{'%064x' % (i * 100 + c)}",
                }
            )
        pods[(nsn, pod)] = {
            "pod_id": f"podid-{i}",
            "pod_ip": None if rng.random() < 0.2 else f"10.0.0.{i}",
            "host": f"node-{i % 3}",
            "labels": {} if rng.random() < 0.3 else {"app": f"a{i}", "dot.key": "v"},
            "annotations": {}
            if rng.random() < 0.3
            else {"custom.k": f"pv{i}", "builder": "b", "field.two": "f"},
            "ownerrefs": []
            if rng.random() < 0.5
            else [{"kind": "ReplicaSet", "name": f"rs-{i}"}],
            "containers": containers,
            "creation_timestamp": BASE_TS,
        }
    return namespaces, missing_ns, pods


def _gen_rows(rng, namespaces, missing_ns, pods, n=120):
    rows = []
    pod_keys = list(pods)
    all_ns = list(namespaces) + missing_ns
    hex64 = lambda: "%064x" % rng.getrandbits(256)
    for i in range(n):
        kind = rng.random()
        if kind < 0.35 and pod_keys:  # existing pod, containers tag
            nsn, pod = pod_keys[rng.randrange(len(pod_keys))]
            cont = rng.choice(["c0", "c1", "c9"])
            tool = f"var.log.containers.{pod}_{nsn}_{cont}-{hex64()}.log"
        elif kind < 0.55 and pod_keys:  # existing pod, pods tag
            nsn, pod = pod_keys[rng.randrange(len(pod_keys))]
            cont = rng.choice(["c0", "c2"])
            tool = f"var.log.pods.{nsn}_{pod}_{'%08x' % i}-u.{cont}.{i % 3}.log"
        elif kind < 0.8:  # missing pod
            nsn = all_ns[rng.randrange(len(all_ns))]
            tool = f"var.log.containers.gone-{i}_{nsn}_c-{hex64()}.log"
        elif kind < 0.9:
            tool = rng.choice(["", "non-kubernetes", "var.log.containers.bad"])
        else:
            nsn = all_ns[rng.randrange(len(all_ns))]
            tool = f"var.log.pods.{nsn}_gone-{i}_{'%08x' % i}.c0.0.log"
        ts = BASE_TS + timedelta(days=rng.randint(-500, 500))
        rows.append((f"c{i:05d}", i, "tool", f"txt {i}", tool, ts))
    return rows


def _dims_to_spark(spark, namespaces, pods):
    ns_rows = [
        (name, d["namespace_id"], d["labels"], d["annotations"], d["creation_timestamp"])
        for name, d in namespaces.items()
    ]
    pod_rows = [
        (
            nsn,
            pod,
            d["pod_id"],
            d["pod_ip"],
            d["host"],
            d["labels"],
            d["annotations"],
            [(o["kind"], o["name"]) for o in d["ownerrefs"]],
            [(c["name"], c["image"], c["image_id"], c["container_id"]) for c in d["containers"]],
            d["creation_timestamp"],
        )
        for (nsn, pod), d in pods.items()
    ]
    return (
        spark.createDataFrame(pod_rows, PODS_SCHEMA),
        spark.createDataFrame(ns_rows, NS_SCHEMA),
    )


CONFIGS = [
    PipelineConfig(),
    PipelineConfig(annotation_match=("custom.+", "^field")),
    PipelineConfig(allow_orphans=False),
    PipelineConfig(skip_namespace_metadata=True),
    PipelineConfig(skip_labels=True, skip_container_metadata=True),
    PipelineConfig(include_ownerrefs_metadata=True, skip_master_url=True),
]


@pytest.mark.parametrize("seed", [7, 42, 1337])
@pytest.mark.parametrize("cfg_i", range(len(CONFIGS)))
def test_spark_matches_spec_model(spark, seed, cfg_i):
    cfg = CONFIGS[cfg_i]
    rng = random.Random(seed * 1000 + cfg_i)
    namespaces, missing_ns, pods = _gen_world(rng)
    rows = _gen_rows(rng, namespaces, missing_ns, pods)
    pods_df, ns_df = _dims_to_spark(spark, namespaces, pods)
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)

    got = {}
    for r in enrich(df, pods_df, ns_df, cfg).collect():
        d = r.asDict(recursive=True)
        flat = {}
        for c in ENRICHED_COLS:
            v = d.get(c)
            if v is None:
                continue
            if isinstance(v, list):
                v = [tuple(sorted(x.items())) for x in v]
            flat[c] = v
        got[d["conv_id"]] = flat

    for (conv_id, _t, _r, _x, tool, ts) in rows:
        expected = model_enrich(tool, ts, pods, namespaces, cfg)
        assert got[conv_id] == expected, (
            f"seed={seed} cfg={cfg_i} conv={conv_id} tool={tool!r} ts={ts}\n"
            f"spark: {got[conv_id]}\nmodel: {expected}"
        )
