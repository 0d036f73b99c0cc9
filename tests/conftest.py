"""Shared Spark session + cassette-mirroring fixture builders.

The dimension/test values mirror the reference's golden fixtures:
test/plugin/test_filter_kubernetes_metadata.rb:27-28 (tags),
test/cassettes/kubernetes_get_pod.yml (pod object),
test/cassettes/kubernetes_get_namespace_default.yml (namespace object).
"""

from __future__ import annotations

from datetime import datetime

import pytest
import pyspark.sql.types as T

from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session

DOCKER_ID = "49095a2894da899d3b327c5fde1e056a81376cc9a8f8b09a195f2a92bceed459"
POD_NAME = "fabric8-console-controller-98rqc"
POD_UID = "c76927af-f563-11e4-b32d-54ee7527188d"
NS_UID = "898268c8-4a36-11e5-9d81-42010af0194c"
CONTAINER = "fabric8-console-container"
IMAGE = "fabric8/hawtio-kubernetes:latest"
IMAGE_ID = "docker://b2bd1a24a68356b2f30128e6e28e672c1ef92df0d9ec01ec0c7faea5d77d2303"
HOST = "jimmi-redhat.localnet"
POD_IP = "172.17.0.8"
MASTER_URL = "https://localhost:8443"

TAG_CONTAINERS = f"var.log.containers.{POD_NAME}_default_{CONTAINER}-{DOCKER_ID}.log"
TAG_PODS = f"var.log.pods.default_{POD_NAME}_{POD_UID}.{CONTAINER}.0.log"

OLD = datetime(2015, 5, 8, 9, 22, 1)
EVENT_TIME = datetime(2017, 1, 1, 12, 0, 0)
FUTURE = datetime(2030, 1, 1, 0, 0, 0)


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


PODS_SCHEMA = T.StructType(
    [
        T.StructField("namespace_name", T.StringType()),
        T.StructField("pod_name", T.StringType()),
        T.StructField("pod_id", T.StringType()),
        T.StructField("pod_ip", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("annotations", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "ownerrefs",
            T.ArrayType(
                T.StructType(
                    [T.StructField("kind", T.StringType()), T.StructField("name", T.StringType())]
                )
            ),
        ),
        T.StructField(
            "containers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("image", T.StringType()),
                        T.StructField("image_id", T.StringType()),
                        T.StructField("container_id", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("creation_timestamp", T.TimestampType()),
    ]
)

NS_SCHEMA = T.StructType(
    [
        T.StructField("namespace_name", T.StringType()),
        T.StructField("namespace_id", T.StringType()),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("annotations", T.MapType(T.StringType(), T.StringType())),
        T.StructField("creation_timestamp", T.TimestampType()),
    ]
)

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

POD_ROW = (
    "default",
    POD_NAME,
    POD_UID,
    POD_IP,
    HOST,
    {"component": "fabric8Console"},
    {
        "kubernetes.io/config.seen": "2015-05-08T09:22:01Z",
        "custom.field1": "curiosity",
        "field.two": "killed_the_cat",
    },
    [("ReplicaSet", "fabric8-console-controller")],
    [(CONTAINER, IMAGE, IMAGE_ID, f"docker://{DOCKER_ID}")],
    OLD,
)

# init-container cassette: empty imageID, empty containerID
# (test/cassettes/kubernetes_get_pod_container_init.yml:126-139)
POD_INIT_ROW = (
    "default",
    "init-pod",
    "init-pod-uid-0001",
    "172.17.0.9",
    HOST,
    {},
    {},
    [],
    [("init-container", "busybox:latest", "", "")],
    OLD,
)

# dotted pod name (test_filter_kubernetes_metadata.rb:560-584)
POD_DOTTED_ROW = (
    "default",
    "fabric8-console-controller.98rqc",
    POD_UID,
    POD_IP,
    HOST,
    {"component": "fabric8Console"},
    {},
    [],
    [(CONTAINER, IMAGE, IMAGE_ID, f"docker://{DOCKER_ID}")],
    OLD,
)

# pod present in a namespace that is ABSENT from the ns dim
POD_STRAY_ROW = (
    "ghost-ns",
    "stray-pod",
    "stray-pod-uid-0001",
    "172.17.0.10",
    HOST,
    {"app": "stray"},
    {},
    [],
    [("main", "img:1", "docker://deadbeef", "docker://" + "a" * 64)],
    OLD,
)

NS_DEFAULT_ROW = ("default", NS_UID, {"tenant": "test"}, {"workspaceId": "myWorkspaceName"}, OLD)
NS_FUTURE_ROW = ("newns", "future-ns-uid-01", {"tenant": "new"}, {}, FUTURE)


@pytest.fixture(scope="session")
def pods_dim(spark):
    return spark.createDataFrame(
        [POD_ROW, POD_INIT_ROW, POD_DOTTED_ROW, POD_STRAY_ROW], PODS_SCHEMA
    )


@pytest.fixture(scope="session")
def ns_dim(spark):
    return spark.createDataFrame([NS_DEFAULT_ROW, NS_FUTURE_ROW], NS_SCHEMA)


def transcript(spark, tag, ts=EVENT_TIME, conv="conv-1", turn=0, text="hello world"):
    return spark.createDataFrame([(conv, turn, "tool", text, tag, ts)], TRANSCRIPT_SCHEMA)


def enriched_row(df):
    """Collect a single enriched row into a {col: value} dict with None
    values dropped (null == omitted, SURVEY.md section 7.4 item 1)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.enrich import ENRICHED_COLS

    rows = df.collect()
    assert len(rows) == 1, f"expected 1 row, got {len(rows)}"
    d = rows[0].asDict(recursive=True)
    out = {}
    for c in ENRICHED_COLS:
        v = d.get(c)
        if v is None:
            continue
        if isinstance(v, list):
            v = [tuple(sorted(x.items())) if isinstance(x, dict) else x for x in v]
        out[c] = v
    return out
