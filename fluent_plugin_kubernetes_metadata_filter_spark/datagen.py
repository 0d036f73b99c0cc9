"""Deterministic synthetic transcripts + dimension tables.

The engine's input contract (BASELINE.json input_hint) is a table
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` where ``tool`` carries the tag-analogue
source string shaped like the reference's fluentd tags
(test/plugin/test_filter_kubernetes_metadata.rb:27-28):

  var.log.containers.<pod>_<ns>_<container>-<64hex>.log
  var.log.pods.<ns>_<pod>_<pod_uuid>.<container>.<n>.log

Dimensions mirror the reference's cassette pod/namespace objects
(test/cassettes/kubernetes_get_pod.yml etc., FIXTURES.md sections 3-4).

Everything is generated with fixed seeds / name-derived uuids so any two
runs (and the DuckDB oracle) see byte-identical tables. Scale factor is
parsed from the sf-dir name; dims stay fixed-size (they are broadcast
dimensions) while transcripts scale linearly.

Each conversation is assigned a golden scenario (FIXTURES.md section 5)
so every branch of kubernetes_metadata_cache_strategy.rb:24-102 has
coverage at every scale factor, plus a deliberately hot (namespace, pod)
pair to exercise skew salting.
"""

from __future__ import annotations

import hashlib
import os
import re
import tempfile
import uuid
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
GEN_VERSION = 12  # bump to force regeneration of /root/repo/data

# Small row groups so Spark's file splitter can parallelize a single
# local parquet file (splits only land on row-group boundaries).
# 32768 (round 7, was 65536): at sf0.1 the 1.17M-row transcripts file
# carried only 18 row groups — a hard ceiling of 18 scan tasks on 32
# cores whatever the split size; 32768-row groups give ~36 splittable
# units so the scan fills the box (values unchanged — layout only).
ROW_GROUP_SIZE = 32768

_UUID_NS = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")

EPOCH = datetime(2024, 3, 1, tzinfo=timezone.utc)

ROLES = ["user", "assistant", "tool", "system"]

# ---------------------------------------------------------------- scenarios
# weights sum to 1.0; see FIXTURES.md section 5
SCENARIOS = [
    ("hit_containers", 0.34),          # full enrichment, /var/log/containers tag
    ("hit_pods", 0.16),                # full enrichment, /var/log/pods tag (no docker id)
    ("hit_dotted", 0.04),              # dotted pod name (test_filter:560-584)
    ("pod_miss_old_ns", 0.08),         # as-of accept: ns older than record (cache_strategy:49-56)
    ("pod_miss_future_ns", 0.04),      # as-of reject: ns newer than record (test_cache_strategy:118-128)
    ("orphan_both_missing", 0.08),     # orphan fallback (cache_strategy:58-79)
    ("orphan_pod_found_ns_missing", 0.04),  # ns-missing branch also orphans (cache_strategy:60-66)
    ("passthrough", 0.08),             # non-matching tag (test_filter:586-600)
    ("hot", 0.14),                     # skew: all map to one (ns, pod)
]


def _det_uuid(name: str) -> str:
    return str(uuid.uuid5(_UUID_NS, name))


def _hex64(name: str) -> str:
    return hashlib.sha256(name.encode()).hexdigest()  # hexdigest is 64 chars


def sf_from_dir(sf_dir: str) -> str:
    """Extract the 'sf0.01'-style component from a testdata dir path.

    Raises on a path with no sfN component: a silent sf0.01 fallback
    would pair a typo'd SPARK_GRAFT_SF_DIR with wrong-scale aux dims —
    exactly the silent-mismatch oracle_check guards against."""
    m = re.search(r"(sf\d+(?:\.\d+)?)", sf_dir)
    if not m:
        raise ValueError(f"no sfN component in {sf_dir!r}; pass a .../sf<scale> dir")
    return m.group(1)


def _n_convs(sf_name: str) -> int:
    sf = float(sf_name[2:])
    # ~30 turns/conv average -> ~6k rows at sf0.001, ~600k at sf0.1
    return max(20, int(200_000 * sf))


# ------------------------------------------------------------- dimensions

def _namespaces():
    """24 namespaces; 3 with creation_timestamp in the future of all events
    (as-of reject), plus 2 names that are referenced by tags/pods but are
    deliberately ABSENT (orphan scenarios)."""
    rows = []
    for i in range(24):
        name = "default" if i == 0 else ("kube-system" if i == 1 else f"ns-{i:02d}")
        future = i in (21, 22, 23)
        created = (
            datetime(2025, 6, 1, tzinfo=timezone.utc) + timedelta(days=i)
            if future
            else datetime(2023, 5, 1, tzinfo=timezone.utc) + timedelta(days=3 * i, hours=i)
        )
        labels = {} if i % 7 == 3 else {"tenant": f"tenant-{i % 4}", "team": f"team-{i % 5}"}
        annotations = (
            {}
            if i % 5 == 2
            else {
                "workspaceId": f"workspace-{i:02d}",
                "kubernetes.io/created-by": "datagen",
                f"custom.field{i % 3}": f"cv-{i}",
            }
        )
        rows.append(
            {
                "namespace_name": name,
                "namespace_id": _det_uuid(f"ns/{name}"),
                "labels": labels,
                "annotations": annotations,
                "creation_timestamp": created,
            }
        )
    missing = ["ghost-ns-a", "ghost-ns-b"]  # never in the dim
    return rows, missing


def _pods(ns_rows, missing_ns):
    """~8 pods per present namespace + 2 pods that live in missing
    namespaces (pod-found/ns-missing orphan branch) + per-namespace pods
    that are referenced by tags but absent from the dim (pod-miss)."""
    rows = []
    for ns in ns_rows:
        nsn = ns["namespace_name"]
        for j in range(8):
            dotted = j == 6
            pod = f"app.v2-{j:02d}-{nsn}" if dotted else f"web-{nsn}-5d9f8b{j:02d}"
            full = f"{nsn}/{pod}"
            n_containers = 1 + (j % 3)
            containers = []
            for c in range(n_containers):
                cname = f"main-{c}" if c == 0 else f"sidecar-{c}"
                init_like = j == 5 and c == n_containers - 1
                containers.append(
                    {
                        "name": cname,
                        "image": f"registry.example/{nsn}/{cname}:v{1 + (j + c) % 4}",
                        # init-container cassette: empty imageID / no containerID
                        # (test/cassettes/kubernetes_get_pod_container_init.yml:126-139)
                        "image_id": ""
                        if init_like
                        else f"docker-pullable://registry.example/{nsn}/{cname}@sha256:{_hex64(full + cname)}",
                        "container_id": "" if init_like else f"docker://{_hex64('cid/' + full + cname)}",
                    }
                )
            labels = (
                {}
                if j == 4
                else {"app": pod.split("-")[0], "component": f"comp-{j}", "deployment": f"{pod}-dep"}
            )
            annotations = (
                {}
                if j == 3
                else {
                    "builder": f"builder-{j}",
                    "custom.field1": f"pv-{j}",
                    "field.two": f"pw-{j}",
                    "kubernetes.io/psp": "restricted",
                }
            )
            rows.append(
                {
                    "namespace_name": nsn,
                    "pod_name": pod,
                    "pod_id": _det_uuid(f"pod/{full}"),
                    # j==4 pods have no podIP yet (pending/hostNetwork
                    # analogue): a FULL dim hit with a legitimately-null
                    # pod_ip — guards against proxying the branch off
                    # pod_ip nullness anywhere downstream
                    "pod_ip": None if j == 4
                    else f"10.{int(hashlib.md5(nsn.encode()).hexdigest()[:4], 16) % 200}.{j}.{(j * 7) % 250 + 1}",
                    "host": f"node-{(j + len(nsn)) % 6:02d}",
                    "labels": labels,
                    "annotations": annotations,
                    "ownerrefs": [
                        {"kind": "ReplicaSet", "name": f"{pod}-rs"},
                        {"kind": "Deployment", "name": f"{pod}-dep"},
                    ]
                    if j % 2 == 0
                    else [],
                    "containers": containers,
                    "creation_timestamp": datetime(2023, 8, 1, tzinfo=timezone.utc)
                    + timedelta(hours=j, minutes=len(nsn)),
                }
            )
    # pods present in dim under namespaces that are NOT in the ns dim
    for k, nsn in enumerate(missing_ns):
        pod = f"stray-{k}"
        rows.append(
            {
                "namespace_name": nsn,
                "pod_name": pod,
                "pod_id": _det_uuid(f"pod/{nsn}/{pod}"),
                "pod_ip": f"10.99.{k}.1",
                "host": "node-99",
                "labels": {"app": "stray"},
                "annotations": {},
                "ownerrefs": [],
                "containers": [
                    {
                        "name": "main-0",
                        "image": f"registry.example/{nsn}/main:v1",
                        "image_id": f"docker-pullable://registry.example/{nsn}/main@sha256:{_hex64(nsn + pod)}",
                        "container_id": f"docker://{_hex64('cid/' + nsn + pod)}",
                    }
                ],
                "creation_timestamp": datetime(2023, 8, 1, tzinfo=timezone.utc),
            }
        )
    return rows


# ------------------------------------------------------------ tag helpers

def tag_containers(pod: str, ns: str, container: str, docker_id: str) -> str:
    return f"var.log.containers.{pod}_{ns}_{container}-{docker_id}.log"


def tag_pods(ns: str, pod: str, pod_uuid: str, container: str, n: int = 0) -> str:
    return f"var.log.pods.{ns}_{pod}_{pod_uuid}.{container}.{n}.log"


# ------------------------------------------------------------ transcripts

def _conv_assignments(n_convs: int, ns_rows, pod_rows, missing_ns, rng: np.random.RandomState):
    """Assign each conversation a scenario + (ns, pod, container, tag)."""
    present_ns = [r["namespace_name"] for r in ns_rows if r["creation_timestamp"] < EPOCH]
    future_ns = [r["namespace_name"] for r in ns_rows if r["creation_timestamp"] >= EPOCH]
    pods_by_ns = {}
    for p in pod_rows:
        pods_by_ns.setdefault(p["namespace_name"], []).append(p)

    names = [s for s, _ in SCENARIOS]
    weights = np.array([w for _, w in SCENARIOS])
    scen = rng.choice(len(names), size=n_convs, p=weights / weights.sum())

    hot_ns = "default"
    hot_pod = pods_by_ns[hot_ns][0]

    out = []
    for i in range(n_convs):
        s = names[scen[i]]
        if s == "hot":
            p = hot_pod
            c = p["containers"][0]["name"]
            tag = tag_containers(p["pod_name"], hot_ns, c, _hex64(f"hot/{i % 4}"))
        elif s in ("hit_containers", "hit_pods", "hit_dotted"):
            nsn = present_ns[int(rng.randint(len(present_ns)))]
            cand = pods_by_ns[nsn]
            if s == "hit_dotted":
                cand = [p for p in cand if "." in p["pod_name"]] or cand
            p = cand[int(rng.randint(len(cand)))]
            ci = int(rng.randint(len(p["containers"])))
            c = p["containers"][ci]["name"]
            if s == "hit_pods":
                tag = tag_pods(nsn, p["pod_name"], p["pod_id"], c, int(rng.randint(3)))
            else:
                tag = tag_containers(p["pod_name"], nsn, c, _hex64(f"conv/{i}"))
        elif s == "pod_miss_old_ns":
            nsn = present_ns[int(rng.randint(len(present_ns)))]
            pod = f"vanished-{i % 17:02d}"
            c = "main-0"
            if i % 2 == 0:
                tag = tag_pods(nsn, pod, _det_uuid(f"gone/{i}"), c)
            else:
                tag = tag_containers(pod, nsn, c, _hex64(f"gone/{i}"))
            p = None
        elif s == "pod_miss_future_ns":
            nsn = future_ns[i % len(future_ns)]
            pod = f"vanished-{i % 17:02d}"
            c = "main-0"
            tag = tag_containers(pod, nsn, c, _hex64(f"future/{i}"))
            p = None
        elif s == "orphan_both_missing":
            nsn = missing_ns[i % len(missing_ns)]
            pod = f"lost-{i % 13:02d}"
            c = "main-0"
            tag = tag_containers(pod, nsn, c, _hex64(f"lost/{i}"))
            p = None
        elif s == "orphan_pod_found_ns_missing":
            nsn = missing_ns[i % len(missing_ns)]
            p = pods_by_ns[nsn][0]
            c = "main-0"
            tag = tag_containers(p["pod_name"], nsn, c, _hex64(f"stray/{i}"))
        else:  # passthrough
            nsn, p, c = "", None, ""
            tag = "non-kubernetes" if i % 3 else "var.log.containers.malformed"
        out.append((s, tag))
    return out


_WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark shuffle broadcast join "
    "partition executor task stage codegen arrow pandas vector batch".split()
)


def generate_sf(out_dir: str, sf_name: str) -> None:
    """Write all tables for one scale factor into out_dir (must exist)."""
    rng = np.random.RandomState(SEED)
    ns_rows, missing_ns = _namespaces()
    pod_rows = _pods(ns_rows, missing_ns)
    n_convs = _n_convs(sf_name)
    assign = _conv_assignments(n_convs, ns_rows, pod_rows, missing_ns, rng)

    # turn counts: 5..60, hot convs 120..320
    base = rng.randint(5, 61, size=n_convs)
    hot_mask = np.array([s == "hot" for s, _ in assign])
    base[hot_mask] = rng.randint(120, 321, size=int(hot_mask.sum()))

    total = int(base.sum())
    conv_idx = np.repeat(np.arange(n_convs), base)
    turn_idx = np.concatenate([np.arange(n) for n in base]).astype(np.int32)

    conv_ids = np.array([f"conv-{i:06d}" for i in range(n_convs)])
    tags = np.array([t for _, t in assign], dtype=object)

    role_codes = rng.randint(0, 4, size=total)
    roles = np.array(ROLES, dtype=object)[role_codes]

    # ~8% of rows in matched convs carry an empty tool (passthrough rows
    # inside otherwise-enriched conversations)
    empty_mask = rng.random_sample(total) < 0.08
    tool = tags[conv_idx].copy()
    tool[empty_mask] = ""

    words = _WORDS[rng.randint(0, len(_WORDS), size=(total, 6))]
    text = np.array(
        [
            f"turn {t} of {conv_ids[c]}: " + " ".join(w)
            for t, c, w in zip(turn_idx, conv_idx, words)
        ],
        dtype=object,
    )

    # timestamps: conversation start staggered over 10 days, +7s per turn
    conv_start = rng.randint(0, 10 * 86400, size=n_convs)
    ts_sec = conv_start[conv_idx] + turn_idx.astype(np.int64) * 7
    ts = (np.datetime64(EPOCH.replace(tzinfo=None)) + ts_sec.astype("timedelta64[s]")).astype(
        "datetime64[us]"
    )

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids[conv_idx], pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(
        transcripts,
        os.path.join(out_dir, "transcripts.parquet"),
        row_group_size=ROW_GROUP_SIZE,
    )

    _write_dims(out_dir, ns_rows, pod_rows)
    _write_carried(out_dir, pod_rows, rng)
    _write_logs(out_dir, max(2000, total // 6), rng)


def _map_arr(dicts):
    return pa.array(
        [sorted(d.items()) for d in dicts], pa.map_(pa.string(), pa.string())
    )


def _write_dims(out_dir, ns_rows, pod_rows):
    ns_tbl = pa.table(
        {
            "namespace_name": pa.array([r["namespace_name"] for r in ns_rows]),
            "namespace_id": pa.array([r["namespace_id"] for r in ns_rows]),
            "labels": _map_arr([r["labels"] for r in ns_rows]),
            "annotations": _map_arr([r["annotations"] for r in ns_rows]),
            "creation_timestamp": pa.array(
                [r["creation_timestamp"].replace(tzinfo=None) for r in ns_rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(ns_tbl, os.path.join(out_dir, "namespaces_dim.parquet"))

    cont_type = pa.list_(
        pa.struct(
            [
                ("name", pa.string()),
                ("image", pa.string()),
                ("image_id", pa.string()),
                ("container_id", pa.string()),
            ]
        )
    )
    owner_type = pa.list_(pa.struct([("kind", pa.string()), ("name", pa.string())]))
    pods_tbl = pa.table(
        {
            "namespace_name": pa.array([r["namespace_name"] for r in pod_rows]),
            "pod_name": pa.array([r["pod_name"] for r in pod_rows]),
            "pod_id": pa.array([r["pod_id"] for r in pod_rows]),
            "pod_ip": pa.array([r["pod_ip"] for r in pod_rows]),
            "host": pa.array([r["host"] for r in pod_rows]),
            "labels": _map_arr([r["labels"] for r in pod_rows]),
            "annotations": _map_arr([r["annotations"] for r in pod_rows]),
            "ownerrefs": pa.array([r["ownerrefs"] for r in pod_rows], owner_type),
            "containers": pa.array([r["containers"] for r in pod_rows], cont_type),
            "creation_timestamp": pa.array(
                [r["creation_timestamp"].replace(tzinfo=None) for r in pod_rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(pods_tbl, os.path.join(out_dir, "pods_dim.parquet"))

    # flat side tables so the DuckDB oracle can express map/array logic
    # relationally (same information, exploded)
    flat = {"namespace_name": [], "pod_name": [], "container_name": [], "image": [], "image_id": [], "container_id": []}
    for r in pod_rows:
        for c in r["containers"]:
            flat["namespace_name"].append(r["namespace_name"])
            flat["pod_name"].append(r["pod_name"])
            flat["container_name"].append(c["name"])
            flat["image"].append(c["image"])
            flat["image_id"].append(c["image_id"])
            flat["container_id"].append(c["container_id"])
    pq.write_table(pa.table(flat), os.path.join(out_dir, "pod_containers_dim.parquet"))

    for fname, rows, keycols in (
        ("pod_annotations_dim", pod_rows, ("namespace_name", "pod_name")),
        ("ns_annotations_dim", ns_rows, ("namespace_name",)),
        ("pod_labels_dim", pod_rows, ("namespace_name", "pod_name")),
        ("ns_labels_dim", ns_rows, ("namespace_name",)),
    ):
        src = "annotations" if "annotations" in fname else "labels"
        cols = {k: [] for k in keycols} | {"key": [], "value": []}
        for r in rows:
            for k, v in sorted(r[src].items()):
                for kc in keycols:
                    cols[kc].append(r[kc])
                cols["key"].append(k)
                cols["value"].append(v)
        pq.write_table(pa.table(cols), os.path.join(out_dir, f"{fname}.parquet"))


def _write_carried(out_dir, pod_rows, rng):
    """transcripts_carried: rows whose record already carries
    kubernetes/docker identity structs (filter:384-399 override path).
    The tag deliberately points at a DIFFERENT pod (or doesn't match) to
    prove record fields win; ~1/4 rows carry a partial identity (null
    container_name) and must fall back to the tag."""
    real = [r for r in pod_rows if r["namespace_name"].startswith("ns-")]
    n = 400
    rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts",
                            "k8s_namespace_name", "k8s_pod_name", "k8s_container_name",
                            "docker_container_id")}
    for i in range(n):
        p = real[int(rng.randint(len(real)))]
        c = p["containers"][0]
        partial = i % 4 == 3
        rows["conv_id"].append(f"carried-{i:05d}")
        rows["turn_idx"].append(i % 7)
        rows["role"].append(ROLES[i % 4])
        rows["text"].append(f"carried turn {i}")
        # tag points elsewhere (or nowhere) — record identity must win
        other = real[(int(rng.randint(len(real))) + 1) % len(real)]
        rows["tool"].append(
            tag_containers(other["pod_name"], other["namespace_name"], "main-0", _hex64(f"carried/{i}"))
            if i % 2
            else "non-kubernetes"
        )
        rows["ts"].append((EPOCH + timedelta(seconds=i * 11)).replace(tzinfo=None))
        rows["k8s_namespace_name"].append(p["namespace_name"])
        rows["k8s_pod_name"].append(p["pod_name"])
        rows["k8s_container_name"].append(None if partial else c["name"])
        rows["docker_container_id"].append(_hex64(f"carried-id/{i}"))
    tbl = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"]),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"]),
            "text": pa.array(rows["text"]),
            "tool": pa.array(rows["tool"]),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "k8s_namespace_name": pa.array(rows["k8s_namespace_name"]),
            "k8s_pod_name": pa.array(rows["k8s_pod_name"]),
            "k8s_container_name": pa.array(rows["k8s_container_name"], pa.string()),
            "docker_container_id": pa.array(rows["docker_container_id"]),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "transcripts_carried.parquet"))


def _write_logs(out_dir, n, rng):
    """Synthetic apache-combined access-log lines (grok parse fixture);
    ~7% malformed lines exercise the no-match path."""
    verbs = np.array(["GET", "POST", "PUT", "DELETE"], dtype=object)
    paths = np.array([f"/api/v1/resource{i}" for i in range(20)] + ["/", "/health"], dtype=object)
    users = np.array(["-", "alice", "bob", "svc-1"], dtype=object)
    codes = np.array(["200", "200", "200", "301", "404", "500"], dtype=object)
    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun"]
    lines = []
    for i in range(n):
        if rng.random_sample() < 0.07:
            lines.append(f"malformed line {i} without structure")
            continue
        ip = f"10.{int(rng.randint(0,256))}.{int(rng.randint(0,256))}.{int(rng.randint(1,255))}"
        ts = f"{int(rng.randint(1,29)):02d}/{months[int(rng.randint(0,6))]}/2024:{int(rng.randint(0,24)):02d}:{int(rng.randint(0,60)):02d}:{int(rng.randint(0,60)):02d} +0000"
        lines.append(
            f'{ip} - {users[int(rng.randint(0,4))]} [{ts}] '
            f'"{verbs[int(rng.randint(0,4))]} {paths[int(rng.randint(0,22))]} HTTP/1.1" '
            f'{codes[int(rng.randint(0,6))]} {int(rng.randint(64, 65536))}'
        )
    tbl = pa.table({
        "log_id": pa.array(range(n), pa.int64()),
        "line": pa.array(lines, pa.string()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "logs.parquet"), row_group_size=ROW_GROUP_SIZE)


# ------------------------------------------------------------- entrypoint

DATA_ROOT = "/root/repo/data"


def ensure_sf(sf_dir: str) -> str:
    """Map a testdata sf dir to the matching generated aux-data dir,
    generating it (atomically, idempotently) if missing. Returns the dir."""
    sf_name = sf_from_dir(sf_dir)
    dest = os.path.join(DATA_ROOT, sf_name)
    marker = os.path.join(dest, f".complete-v{GEN_VERSION}")
    if os.path.exists(marker):
        return dest
    os.makedirs(DATA_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{sf_name}-", dir=DATA_ROOT)
    generate_sf(tmp, sf_name)
    open(os.path.join(tmp, f".complete-v{GEN_VERSION}"), "w").close()
    try:
        os.rename(tmp, dest)
    except OSError:
        # another process won the race or a stale dir exists
        import shutil

        if os.path.exists(marker):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            shutil.rmtree(dest, ignore_errors=True)
            os.rename(tmp, dest)
    return dest


if __name__ == "__main__":
    import sys

    for sf in sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]:
        d = ensure_sf(sf)
        print(sf, "->", d)
