"""Tag/source-string extraction (SURVEY.md O5-O8).

Re-expresses the reference's tag regexes
(lib/fluent/plugin/filter_kubernetes_metadata.rb:57-58, applied at :365)
as Spark expressions. The reference compiles one union regex
``(PODS|CONTAINERS)``; Java regex forbids duplicate named groups across
alternation branches, so we keep the two branches as separate patterns and
model the first-match alternation (O6) with ``rlike`` + ``when`` — the
branches have disjoint literal prefixes (var.log.pods vs
var.log.containers) so ordering only matters for pathological tags, where
we preserve the reference's PODS-first order.

Two execution strategies, identical results (tested against each other):

- ``native``: ``F.regexp_extract`` per group — stays inside whole-stage
  codegen, zero Python. Group indices are computed programmatically from
  the pattern via Python ``re`` so they can never drift from the pattern.
- ``pandas``: one vectorized pandas UDF over Arrow batches using
  ``pd.Series.str.extract`` (named groups, one regex pass per branch per
  batch). No per-row Python anywhere.

At 100 TB the extraction is embarrassingly parallel and pipelined into
the scan; neither path shuffles.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame

# Verbatim semantics of filter_kubernetes_metadata.rb:57-58 (named-group
# syntax (?<x>...) is shared by Ruby/Java; Python needs (?P<x>...)).
REGEX_VAR_LOG_PODS = (
    r"(var\.log\.pods)\.(?<namespace>[^_]+)_"
    r"(?<pod_name>[a-z0-9]([-a-z0-9]*[a-z0-9])?(\.[a-z0-9]([-a-z0-9]*[a-z0-9])?)*)_"
    r"(?<pod_uuid>[a-z0-9-]*)\.(?<container_name>.+)\..*\.log$"
)
REGEX_VAR_LOG_CONTAINERS = (
    r"(var\.log\.containers)\."
    r"(?<pod_name>[a-z0-9]([-a-z0-9]*[a-z0-9])?(\.[a-z0-9]([-a-z0-9]*[a-z0-9])?)*)_"
    r"(?<namespace>[^_]+)_(?<container_name>.+)-(?<docker_id>[a-z0-9]{64})\.log$"
)

# Columns produced by extraction. x_ prefix = "extracted".
EXTRACTED_COLS = [
    "x_namespace",
    "x_pod_name",
    "x_container_name",
    "x_pod_uuid",
    "x_docker_id",
    "x_branch",  # 'pods' | 'containers' | null (no match)
]


def _pyre(pattern: str) -> "re.Pattern":
    """Compile a Ruby/Java-style named-group pattern with Python re."""
    return re.compile(pattern.replace("(?<", "(?P<").replace("(?P<=", "(?<=").replace("(?P<!", "(?<!"))


def group_index(pattern: str) -> dict[str, int]:
    """name -> group number; identical numbering in Python & Java regex
    (groups are numbered by opening parenthesis; named groups count)."""
    return dict(_pyre(pattern).groupindex)


def _java_pattern(pattern: str) -> str:
    """Java named-group names may not contain '_' (unlike Ruby/Python),
    so strip the names into anonymous groups for the JVM-side pattern —
    group NUMBERING is identical, and we address groups by number."""
    return re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", "(", pattern)


def _native_branch(col: Column, pattern: str, names: list[str]) -> dict[str, Column]:
    gi = group_index(pattern)
    jp = _java_pattern(pattern)
    return {n: F.regexp_extract(col, jp, gi[n]) for n in names if n in gi}


def extract_native(df: DataFrame, source_col: str = "tool",
                   pods_pattern: str | None = None,
                   containers_pattern: str | None = None) -> DataFrame:
    """JVM-side extraction. Adds EXTRACTED_COLS; null = group absent.

    All six outputs come from ONE staged struct per row, so each branch
    RLIKE evaluates once per row instead of once per output column (the
    per-column formulation ran the union regex up to 12x/row — measured
    2.8s -> 1.6s at sf0.1 on the isolated extraction; the non-cheap
    multi-referenced ``_xs`` alias blocks CollapseProject from
    re-inlining, the same staging contract as ``extract_fast``). Each
    branch RLIKE is additionally guarded by a ``contains()`` on the
    branch's literal prefix — a NECESSARY condition for a match when
    the pattern embeds that literal — so passthrough rows (no k8s tag)
    skip the backtracking regexes entirely. Custom patterns get no
    contains guard (their required literals are unknown)."""
    pp = pods_pattern or REGEX_VAR_LOG_PODS
    cp = containers_pattern or REGEX_VAR_LOG_CONTAINERS
    src = F.col(source_col)
    pods_m = src.rlike(_java_pattern(pp))
    cont_m = src.rlike(_java_pattern(cp))
    if pods_pattern is None:
        pods_m = F.contains(src, F.lit(_PODS_PREFIX)) & pods_m
    if containers_pattern is None:
        cont_m = F.contains(src, F.lit(_CONT_PREFIX)) & cont_m
    p = _native_branch(src, pp, ["namespace", "pod_name", "container_name", "pod_uuid"])
    c = _native_branch(src, cp, ["namespace", "pod_name", "container_name", "docker_id"])
    null = F.lit(None).cast("string")

    def fields(vals: dict[str, Column]) -> Column:
        order = ["namespace", "pod_name", "container_name", "pod_uuid", "docker_id"]
        return F.struct(
            *[(vals[n] if vals.get(n) is not None else null).alias(f"x_{n}")
              for n in order]
        )

    # PODS branch first, like the reference's union regex (filter:66-67).
    xs = (
        F.when(pods_m, fields(p))
        .when(cont_m, fields(c))
        .otherwise(fields({}))
    )
    # x_branch stays OUTSIDE the struct: a downstream filter on the
    # branch (q_parse_containers/q_parse_pods) then pushes down only the
    # cheap match conditions — were it a struct field, predicate
    # pushdown would inline the WHOLE struct (all four regexp_extracts)
    # into the Filter just to read one field (round 7, plan-verified;
    # within one Project codegen subexpression elimination already
    # shares the match conditions between x_branch and _xs).
    branch = F.when(pods_m, F.lit("pods")).when(cont_m, F.lit("containers"))
    df = df.withColumn("_xs", xs).withColumn("x_branch", branch)
    for name in EXTRACTED_COLS:
        if name != "x_branch":
            df = df.withColumn(name, F.col(f"_xs.{name}"))
    return df.drop("_xs")


_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("x_namespace", T.StringType()),
        T.StructField("x_pod_name", T.StringType()),
        T.StructField("x_container_name", T.StringType()),
        T.StructField("x_pod_uuid", T.StringType()),
        T.StructField("x_docker_id", T.StringType()),
        T.StructField("x_branch", T.StringType()),
    ]
)


def make_extract_pandas_udf(pods_pattern: str | None = None,
                            containers_pattern: str | None = None):
    """Vectorized Arrow-batched extraction UDF (input_hint: pandas UDFs,
    no per-row Python). One ``str.extract`` pass per branch per batch."""
    pp = _pyre(pods_pattern or REGEX_VAR_LOG_PODS)
    cp = _pyre(containers_pattern or REGEX_VAR_LOG_CONTAINERS)

    @F.pandas_udf(_EXTRACT_SCHEMA)
    def extract(s: pd.Series) -> pd.DataFrame:
        s = s.astype("string")
        pe = s.str.extract(pp)
        ce = s.str.extract(cp)
        pods_m = pe["namespace"].notna()
        cont_m = ce["namespace"].notna() & ~pods_m
        out = pd.DataFrame(
            {
                "x_namespace": pe["namespace"].where(pods_m, ce["namespace"].where(cont_m)),
                "x_pod_name": pe["pod_name"].where(pods_m, ce["pod_name"].where(cont_m)),
                "x_container_name": pe["container_name"].where(
                    pods_m, ce["container_name"].where(cont_m)
                ),
                "x_pod_uuid": pe["pod_uuid"].where(pods_m),
                "x_docker_id": ce["docker_id"].where(cont_m),
                "x_branch": pd.Series("pods", index=s.index, dtype="string")
                .where(pods_m)
                .where(~cont_m, "containers"),
            }
        )
        return out.astype(object).where(out.notna(), None)

    return extract


def extract_pandas(df: DataFrame, source_col: str = "tool",
                   pods_pattern: str | None = None,
                   containers_pattern: str | None = None) -> DataFrame:
    udf = make_extract_pandas_udf(pods_pattern, containers_pattern)
    st = udf(F.col(source_col)).alias("_x")
    df = df.withColumn("_x", st)
    for c in EXTRACTED_COLS:
        df = df.withColumn(c, F.col(f"_x.{c}"))
    return df.drop("_x")


def extract_source_fields(df: DataFrame, source_col: str = "tool",
                          method: str = "native",
                          pods_pattern: str | None = None,
                          containers_pattern: str | None = None) -> DataFrame:
    """O5+O6: run the tag regexes over ``source_col`` adding EXTRACTED_COLS."""
    if method == "pandas":
        return extract_pandas(df, source_col, pods_pattern, containers_pattern)
    if method == "fast":
        if pods_pattern or containers_pattern:
            # custom patterns have no structural fast path — use regex
            return extract_native(df, source_col, pods_pattern, containers_pattern)
        return extract_fast(df, source_col)
    return extract_native(df, source_col, pods_pattern, containers_pattern)


def resolve_identity(df: DataFrame, cfg) -> DataFrame:
    """O7 (cache-key selection, filter:368-372) + O8 (record-carried
    kubernetes/docker fields override the tag parse, filter:384-399).

    Adds i_namespace / i_pod_name / i_container_name / i_cache_key /
    i_docker_id / i_matched. The record path requires ALL of
    {kubernetes.namespace_name, kubernetes.pod_name,
    kubernetes.container_name, docker.container_id} non-null (partial
    presence falls back to the tag parse, exactly like the all-or-nothing
    key?-chain at filter:385-391); when taken, the record's container_id
    serves as both cache key and docker id (filter:392-399).
    """
    cols = set(df.columns)
    # record-carried identity either as nested structs (kubernetes.docker
    # input schema) or as flat k8s_* columns (transcripts_carried fixture)
    if {"kubernetes", "docker"} <= cols:
        r_ns = F.col("kubernetes.namespace_name")
        r_pod = F.col("kubernetes.pod_name")
        r_cn = F.col("kubernetes.container_name")
        r_did = F.col("docker.container_id")
        has_record = True
    elif {"k8s_namespace_name", "k8s_pod_name", "k8s_container_name", "docker_container_id"} <= cols:
        r_ns = F.col("k8s_namespace_name")
        r_pod = F.col("k8s_pod_name")
        r_cn = F.col("k8s_container_name")
        r_did = F.col("docker_container_id")
        has_record = True
    else:
        has_record = False

    tag_matched = F.col("x_branch").isNotNull()
    # filter:368-372 — pod_uuid is the key iff the PODS branch matched
    # (it may legally be the empty string); otherwise docker_id.
    tag_key = F.when(F.col("x_branch") == "pods", F.col("x_pod_uuid")).otherwise(
        F.col("x_docker_id")
    )

    if cfg.lookup_from_k8s_field and has_record:
        rec_ok = r_ns.isNotNull() & r_pod.isNotNull() & r_cn.isNotNull() & r_did.isNotNull()
        ns = F.when(rec_ok, r_ns).otherwise(F.col("x_namespace"))
        pod = F.when(rec_ok, r_pod).otherwise(F.col("x_pod_name"))
        cn = F.when(rec_ok, r_cn).otherwise(F.col("x_container_name"))
        key = F.when(rec_ok, r_did).otherwise(tag_key)
        did = F.when(rec_ok, r_did).otherwise(F.col("x_docker_id"))
        matched = rec_ok | tag_matched
    else:
        ns, pod, cn, key, did, matched = (
            F.col("x_namespace"),
            F.col("x_pod_name"),
            F.col("x_container_name"),
            tag_key,
            F.col("x_docker_id"),
            tag_matched,
        )

    return (
        df.withColumn("i_namespace", ns)
        .withColumn("i_pod_name", pod)
        .withColumn("i_container_name", cn)
        .withColumn("i_cache_key", key)
        .withColumn("i_docker_id", did)
        .withColumn("i_matched", matched)
    )


# ---------------------------------------------------------------- fast path

# Anchored component validators — short strings, no global backtracking.
_POD_NAME_RX = r"^[a-z0-9]([-a-z0-9]*[a-z0-9])?(\.[a-z0-9]([-a-z0-9]*[a-z0-9])?)*$"
_HEX64_RX = r"^[a-z0-9]{64}$"
_UUID_RX = r"^[a-z0-9-]*$"

_CONT_PREFIX = "var.log.containers."
_PODS_PREFIX = "var.log.pods."


def extract_fast(df: DataFrame, source_col: str = "tool") -> DataFrame:
    """Split-based extraction with regex fallback (identical results to
    ``extract_native`` — property- and corpus-tested).

    The union regex costs ~10 pattern executions per row and Java regex
    is the scaling bottleneck (branchy backtracking starves SMT siblings;
    see BASELINE.md). For tags that start with the literal prefixes —
    every real fluentd tag — the fields are delimited deterministically:

      var.log.containers.<pod>_<ns>_<container>-<64hex>.log
        pod  = up to 1st '_'   (pod charset excludes '_')
        ns   = up to 2nd '_'   ([^_]+)
        tail = container '-' hex64 '.log'  (greedy .+ == last such split)
      var.log.pods.<ns>_<pod>_<uuid>.<container>.<n>.log
        uuid = up to 1st '.' after pod  ([a-z0-9-]* excludes '.')
        container = tail minus its last two '.'-segments (greedy .+
        against \\..*\\.log$ ends at the second-to-last dot)

    so the whole parse is substrings + short anchored charset checks.
    Rows that fail the structural checks (garbage, adversarial prefixes,
    mid-string matches) fall back to the exact reference regexes — the
    fast path never changes semantics, only the evaluation strategy.
    """
    src = F.col(source_col)

    # ---- containers branch (filter:58)
    c_body = F.expr(f"substring({source_col}, {len(_CONT_PREFIX) + 1})")
    c_i1 = F.instr(c_body, "_")
    c_pod = F.substring(c_body, F.lit(1), c_i1 - 1)
    c_rest1 = F.expr(f"substring(substring({source_col}, {len(_CONT_PREFIX) + 1}), instr(substring({source_col}, {len(_CONT_PREFIX) + 1}), '_') + 1)")
    c_i2 = F.instr(c_rest1, "_")
    c_ns = F.substring(c_rest1, F.lit(1), c_i2 - 1)
    c_rest2 = F.substring(c_rest1, c_i2 + 1, F.lit(1 << 30))
    c_len = F.length(c_rest2)
    c_container = F.substring(c_rest2, F.lit(1), c_len - 69)
    c_docker = F.substring(c_rest2, c_len - 67, F.lit(64))
    c_fast_ok = (
        src.startswith(_CONT_PREFIX)
        & (c_i1 > 0)
        & (c_i2 > 0)
        & (c_len >= 70)
        & (F.substring(c_rest2, c_len - 68, F.lit(1)) == "-")
        & c_rest2.endswith(".log")
        & c_pod.rlike(_POD_NAME_RX)
        & c_docker.rlike(_HEX64_RX)
        & (c_ns != "")
    )

    # ---- pods branch (filter:57)
    p_body = F.expr(f"substring({source_col}, {len(_PODS_PREFIX) + 1})")
    p_i1 = F.instr(p_body, "_")
    p_ns = F.substring(p_body, F.lit(1), p_i1 - 1)
    p_rest1 = F.substring(p_body, p_i1 + 1, F.lit(1 << 30))
    p_i2 = F.instr(p_rest1, "_")
    p_pod = F.substring(p_rest1, F.lit(1), p_i2 - 1)
    p_rest2 = F.substring(p_rest1, p_i2 + 1, F.lit(1 << 30))
    p_i3 = F.instr(p_rest2, ".")
    p_uuid = F.substring(p_rest2, F.lit(1), p_i3 - 1)
    p_tail = F.substring(p_rest2, p_i3 + 1, F.lit(1 << 30))
    p_last2 = F.substring_index(p_tail, ".", -2)
    p_container = F.substring(p_tail, F.lit(1), F.length(p_tail) - F.length(p_last2) - 1)
    p_ndots = F.length(p_tail) - F.length(F.replace(p_tail, F.lit("."), F.lit("")))
    p_fast_ok = (
        src.startswith(_PODS_PREFIX)
        & (p_i1 > 0)
        & (p_i2 > 0)
        & (p_i3 > 0)
        & (p_ns != "")
        & p_pod.rlike(_POD_NAME_RX)
        & p_uuid.rlike(_UUID_RX)
        & (p_ndots >= 2)
        & p_tail.endswith("log")
        & (F.substring_index(p_tail, ".", -1) == "log")
        & (p_container != "")
    )

    # ---- fallback: the exact reference regexes, evaluated ONLY for rows
    # the fast path rejects (codegen CASE short-circuits per row). Each
    # regex is guarded by a contains() on its literal prefix — a
    # NECESSARY condition for a match (the pattern embeds the literal),
    # so semantics are unchanged, but passthrough rows (no k8s tag at
    # all) skip the expensive backtracking regexes entirely.
    pp, cp = REGEX_VAR_LOG_PODS, REGEX_VAR_LOG_CONTAINERS
    rx_pods = F.contains(src, F.lit(_PODS_PREFIX)) & src.rlike(_java_pattern(pp))
    rx_cont = F.contains(src, F.lit(_CONT_PREFIX)) & src.rlike(_java_pattern(cp))
    p_rx = _native_branch(src, pp, ["namespace", "pod_name", "container_name", "pod_uuid"])
    c_rx = _native_branch(src, cp, ["namespace", "pod_name", "container_name", "docker_id"])

    # Build ONE struct so every subexpression appears exactly once in the
    # plan; per-column construction would inline these chains 6x and blow
    # the generated method past the JIT limit (measured: 5x slowdown from
    # interpreted fallback). CollapseProject keeps a non-cheap multi-
    # referenced alias materialized, so the struct is computed once/row.
    null = F.lit(None).cast("string")

    def fields(ns, pod, cn, uuid, did, br):
        return F.struct(
            ns.alias("x_namespace"),
            pod.alias("x_pod_name"),
            cn.alias("x_container_name"),
            uuid.alias("x_pod_uuid"),
            did.alias("x_docker_id"),
            br.alias("x_branch"),
        )

    # PODS precedence first (filter:66-67); fast branch, then regex
    # fallback — the regexes run only for rows the fast checks reject.
    xs = (
        F.when(p_fast_ok, fields(p_ns, p_pod, p_container, p_uuid, null, F.lit("pods")))
        .when(
            rx_pods,
            fields(
                p_rx["namespace"], p_rx["pod_name"], p_rx["container_name"],
                p_rx["pod_uuid"], null, F.lit("pods"),
            ),
        )
        .when(c_fast_ok, fields(c_ns, c_pod, c_container, null, c_docker, F.lit("containers")))
        .when(
            rx_cont,
            fields(
                c_rx["namespace"], c_rx["pod_name"], c_rx["container_name"],
                null, c_rx["docker_id"], F.lit("containers"),
            ),
        )
        .otherwise(fields(null, null, null, null, null, null))
    )
    df = df.withColumn("_xs", xs)
    for c in EXTRACTED_COLS:
        df = df.withColumn(c, F.col(f"_xs.{c}"))
    return df.drop("_xs")
