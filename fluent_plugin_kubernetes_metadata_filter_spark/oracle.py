"""DuckDB oracle SQL for every query in queries.py.

These are independent re-implementations of the semantics in ANSI-ish
SQL over the same parquet files, used by the driver's correctness gate
(CORRECTNESS_r{N}.json) and by scripts/oracle_check.py locally.

The enrichment branch logic mirrors
kubernetes_metadata_cache_strategy.rb:24-102 — see enrich.py for the
branch table; group indices for regexp_extract are computed from the
pattern at build time (parse.group_index) so SQL and Spark can't drift.
"""

from __future__ import annotations

from fluent_plugin_kubernetes_metadata_filter_spark.parse import (
    REGEX_VAR_LOG_CONTAINERS,
    REGEX_VAR_LOG_PODS,
    _java_pattern,
    group_index,
)

AUX = "/root/repo/data/sf0.01"
MASTER_URL = "https://kubernetes.default.svc"

_PP = _java_pattern(REGEX_VAR_LOG_PODS)
_CP = _java_pattern(REGEX_VAR_LOG_CONTAINERS)
_PGI = group_index(REGEX_VAR_LOG_PODS)
_CGI = group_index(REGEX_VAR_LOG_CONTAINERS)


def _aux(name: str) -> str:
    return f"read_parquet('{AUX}/{name}.parquet')"


# Shared CTE: tag extraction over a transcripts-shaped table.
def _x_cte(table_expr: str) -> str:
    return f"""
x AS (
  SELECT *,
    CASE WHEN regexp_matches(tool, '{_PP}') THEN 'pods'
         WHEN regexp_matches(tool, '{_CP}') THEN 'containers' END AS branch,
    CASE WHEN regexp_matches(tool, '{_PP}') THEN regexp_extract(tool, '{_PP}', {_PGI["namespace"]})
         WHEN regexp_matches(tool, '{_CP}') THEN regexp_extract(tool, '{_CP}', {_CGI["namespace"]}) END AS xns,
    CASE WHEN regexp_matches(tool, '{_PP}') THEN regexp_extract(tool, '{_PP}', {_PGI["pod_name"]})
         WHEN regexp_matches(tool, '{_CP}') THEN regexp_extract(tool, '{_CP}', {_CGI["pod_name"]}) END AS xpod,
    CASE WHEN regexp_matches(tool, '{_PP}') THEN regexp_extract(tool, '{_PP}', {_PGI["container_name"]})
         WHEN regexp_matches(tool, '{_CP}') THEN regexp_extract(tool, '{_CP}', {_CGI["container_name"]}) END AS xcontainer,
    CASE WHEN regexp_matches(tool, '{_PP}') THEN regexp_extract(tool, '{_PP}', {_PGI["pod_uuid"]}) END AS xpod_uuid,
    CASE WHEN NOT regexp_matches(tool, '{_PP}') AND regexp_matches(tool, '{_CP}')
         THEN regexp_extract(tool, '{_CP}', {_CGI["docker_id"]}) END AS xdocker_id
  FROM {table_expr}
)"""


# Shared CTE chain: identity -> dim joins -> branch flags.
# i_* columns may be overridden by the record-carried path (carried=True).
def _enrich_ctes(table: str, carried: bool = False) -> str:
    if carried:
        ident = """
ident AS (
  SELECT x.*,
    CASE WHEN rec_ok THEN k8s_namespace_name ELSE xns END AS ins,
    CASE WHEN rec_ok THEN k8s_pod_name ELSE xpod END AS ipod,
    CASE WHEN rec_ok THEN k8s_container_name ELSE xcontainer END AS icontainer,
    CASE WHEN rec_ok THEN docker_container_id
         WHEN branch = 'pods' THEN xpod_uuid ELSE xdocker_id END AS icache_key,
    CASE WHEN rec_ok THEN docker_container_id ELSE xdocker_id END AS idocker_id,
    (rec_ok OR branch IS NOT NULL) AS imatched
  FROM (SELECT *,
          (k8s_namespace_name IS NOT NULL AND k8s_pod_name IS NOT NULL
           AND k8s_container_name IS NOT NULL AND docker_container_id IS NOT NULL) AS rec_ok
        FROM x) x
)"""
    else:
        ident = """
ident AS (
  SELECT x.*, xns AS ins, xpod AS ipod, xcontainer AS icontainer,
    CASE WHEN branch = 'pods' THEN xpod_uuid ELSE xdocker_id END AS icache_key,
    xdocker_id AS idocker_id,
    (branch IS NOT NULL) AS imatched
  FROM x
)"""
    return f"""
{_x_cte(_aux(table))},
{ident},
pdim AS (SELECT namespace_name pns, pod_name ppod, pod_id p_pod_id, pod_ip p_pod_ip, host p_host FROM {_aux("pods_dim")}),
ndim AS (SELECT namespace_name nns, namespace_id n_ns_id, creation_timestamp n_created FROM {_aux("namespaces_dim")}),
cdim AS (SELECT namespace_name cns, pod_name cpod, container_name ccn, image c_image, image_id c_image_id,
                regexp_replace(container_id, '^[-_a-zA-Z0-9]+://', '') AS c_cid
         FROM {_aux("pod_containers_dim")}),
j AS (
  SELECT ident.*, p_pod_id, p_pod_ip, p_host, n_ns_id, n_created
  FROM ident
  LEFT JOIN pdim ON ins = pns AND ipod = ppod
  LEFT JOIN ndim ON ins = nns
),
flags AS (
  SELECT j.*,
    (imatched AND p_pod_id IS NOT NULL) AS pod_found,
    (imatched AND n_ns_id IS NOT NULL) AS ns_found
  FROM j
),
e AS (
  SELECT flags.*,
    (pod_found AND ns_found) AS isfull,
    (NOT pod_found AND ns_found AND n_created <= ts) AS asof_acc,
    (ns_found AND NOT pod_found) AS ns_meta,
    (imatched AND NOT ns_found) AS orphan
  FROM flags
),
enriched AS (
  SELECT conv_id, turn_idx, role, text, ts, p_pod_ip AS pod_ip_raw, isfull, ns_meta, asof_acc, orphan, imatched,
    CASE WHEN orphan THEN '.orphaned' WHEN imatched THEN ins END AS namespace_name,
    CASE WHEN imatched THEN ipod END AS pod_name,
    CASE WHEN imatched THEN icontainer END AS container_name,
    CASE WHEN orphan THEN ins END AS orphaned_namespace,
    CASE WHEN orphan THEN 'orphaned' WHEN isfull OR ns_meta THEN n_ns_id END AS namespace_id,
    CASE WHEN isfull THEN p_pod_id WHEN asof_acc THEN icache_key END AS pod_id,
    CASE WHEN isfull THEN p_pod_ip END AS pod_ip,
    CASE WHEN isfull THEN p_host END AS host,
    CASE WHEN isfull THEN '{MASTER_URL}' END AS master_url,
    CASE WHEN isfull AND ccn IS NOT NULL THEN c_image END AS container_image,
    CASE WHEN isfull AND ccn IS NOT NULL AND c_image_id <> '' THEN c_image_id END AS container_image_id,
    CASE WHEN isfull AND ccn IS NOT NULL AND c_cid <> '' THEN c_cid
         WHEN imatched AND idocker_id IS NOT NULL AND idocker_id <> '' THEN idocker_id END AS docker_container_id
  FROM e
  LEFT JOIN cdim ON e.isfull AND ins = cns AND ipod = cpod AND icontainer = ccn
)"""


def _jaccard_ctes(source: str = "documents", fallback: bool = False) -> str:
    """toks/sh/sizes/inter/jac CTE chain shared by every shingle-Jaccard
    oracle — ONE definition of the 3-gram shingle + Jaccard SQL, so the
    four queries that rank on it cannot drift apart. ``fallback=True``
    adds the whole-text shingle for <3-token docs (the ops.dedup.shingles
    definition the MinHash stack uses); the n-gram query path has no
    fallback. ``jac`` exposes ``jaccard`` (floored to the 1e-4 grid) and
    ``raw_j`` (exact, for raw-threshold filters)."""
    sh_fallback = (
        "\n  WHERE len(tk) >= 3"
        "\n  UNION"
        "\n  SELECT doc_id, array_to_string(tk, ' ') FROM toks WHERE len(tk) < 3"
        if fallback else ""
    )
    return f"""toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM {source}
),
sh AS (
  SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
  FROM toks, unnest(generate_series(1, greatest(len(tk) - 2, 0))) AS t(i){sh_fallback}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         floor(i * 1.0 / (sa.sz + sb.sz - i) * 10000) / 10000 AS jaccard,
         i * 1.0 / (sa.sz + sb.sz - i) AS raw_j
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)"""


def oracle_queries(aux_dir: str | None = None) -> dict[str, str]:
    """Oracle SQL per query. ``aux_dir`` points at the generated
    transcripts/dims matching the scale factor under comparison; the
    default is the driver-gate scale (sf0.01). The SQL is assembled
    against the default and rebased afterwards, so every read_parquet
    path tracks the requested dir."""
    q: dict[str, str] = {}

    q["parse_containers"] = f"""
WITH {_x_cte(_aux("transcripts"))}
SELECT conv_id, turn_idx, xns AS namespace, xpod AS pod_name,
       xcontainer AS container_name, xdocker_id AS docker_id
FROM x WHERE branch = 'containers'"""

    q["parse_pods"] = f"""
WITH {_x_cte(_aux("transcripts"))}
SELECT conv_id, turn_idx, xns AS namespace, xpod AS pod_name,
       xcontainer AS container_name, xpod_uuid AS pod_uuid
FROM x WHERE branch = 'pods'"""

    q["enrich_flat"] = f"""
WITH {_enrich_ctes("transcripts")}
SELECT conv_id, turn_idx, namespace_name, pod_name, container_name,
       orphaned_namespace, pod_id, namespace_id, pod_ip, host, master_url,
       container_image, container_image_id, docker_container_id
FROM enriched"""

    q["route_counts"] = f"""
WITH {_enrich_ctes("transcripts")}
SELECT COALESCE(namespace_name, '__passthrough__') AS sink,
       COUNT(*) AS n_rows
FROM enriched GROUP BY 1"""

    q["sink_role_counts"] = f"""
WITH {_enrich_ctes("transcripts")}
SELECT COALESCE(namespace_name, '__passthrough__') AS sink, role,
       COUNT(*) AS n_rows
FROM enriched GROUP BY 1, 2"""

    q["orphan_counts"] = f"""
WITH {_enrich_ctes("transcripts")}
SELECT orphaned_namespace, COUNT(*) AS n_rows
FROM enriched WHERE orphaned_namespace IS NOT NULL GROUP BY 1"""

    q["asof_branch"] = f"""
WITH {_enrich_ctes("transcripts")}
SELECT conv_id, turn_idx, namespace_name, pod_name, pod_id, namespace_id
FROM enriched
WHERE ns_meta"""

    q["record_override"] = f"""
WITH {_enrich_ctes("transcripts_carried", carried=True)}
SELECT conv_id, turn_idx, namespace_name, pod_name, container_name,
       pod_id, namespace_id, docker_container_id
FROM enriched"""

    q["pod_labels"] = f"""
WITH {_enrich_ctes("transcripts")},
plab AS (SELECT namespace_name lns, pod_name lpod,
                string_agg(key || '=' || value, ',' ORDER BY key) AS labels_str
         FROM {_aux("pod_labels_dim")} GROUP BY 1, 2),
nlab AS (SELECT namespace_name lns2,
                string_agg(key || '=' || value, ',' ORDER BY key) AS ns_labels_str
         FROM {_aux("ns_labels_dim")} GROUP BY 1)
SELECT DISTINCT e.namespace_name, e.pod_name,
       COALESCE(labels_str, '') AS labels_str,
       COALESCE(ns_labels_str, '') AS ns_labels_str
FROM enriched e
LEFT JOIN plab ON e.namespace_name = lns AND e.pod_name = lpod
LEFT JOIN nlab ON e.namespace_name = lns2
WHERE e.isfull"""

    q["annotations_filtered"] = f"""
WITH {_enrich_ctes("transcripts")},
pann AS (SELECT namespace_name ans, pod_name apod,
                string_agg(key || '=' || value, ',' ORDER BY key) AS annotations_str
         FROM {_aux("pod_annotations_dim")}
         WHERE regexp_matches(key, 'custom.+') OR regexp_matches(key, '^field')
         GROUP BY 1, 2),
nann AS (SELECT namespace_name ans2,
                string_agg(key || '=' || value, ',' ORDER BY key) AS ns_annotations_str
         FROM {_aux("ns_annotations_dim")}
         WHERE regexp_matches(key, 'custom.+') OR regexp_matches(key, '^field')
         GROUP BY 1)
SELECT DISTINCT e.namespace_name, e.pod_name,
       COALESCE(annotations_str, '') AS annotations_str,
       COALESCE(ns_annotations_str, '') AS ns_annotations_str
FROM enriched e
LEFT JOIN pann ON e.namespace_name = ans AND e.pod_name = apod
LEFT JOIN nann ON e.namespace_name = ans2
WHERE e.isfull"""

    # skip_namespace_metadata: no ns join; pod hit -> pod meta, else base
    q["skip_ns_meta"] = f"""
WITH {_x_cte(_aux("transcripts"))},
ident AS (
  SELECT x.*, xns AS ins, xpod AS ipod, (branch IS NOT NULL) AS imatched FROM x
),
pdim AS (SELECT namespace_name pns, pod_name ppod, pod_id p_pod_id FROM {_aux("pods_dim")}),
j AS (SELECT ident.*, p_pod_id FROM ident LEFT JOIN pdim ON ins = pns AND ipod = ppod)
SELECT conv_id, turn_idx,
       CASE WHEN imatched THEN ins END AS namespace_name,
       CASE WHEN imatched THEN ipod END AS pod_name,
       CASE WHEN imatched AND p_pod_id IS NOT NULL THEN p_pod_id END AS pod_id,
       CAST(NULL AS VARCHAR) AS namespace_id,
       CASE WHEN imatched AND p_pod_id IS NOT NULL THEN '{MASTER_URL}' END AS master_url
FROM j"""

    q["stable_order"] = f"""
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS INT) AS turn_seq
FROM {_aux("transcripts")}"""

    q["container_correlation"] = f"""
WITH {_enrich_ctes("transcripts")}
SELECT DISTINCT namespace_name, pod_name, container_name, container_image,
       container_image_id, docker_container_id
FROM enriched WHERE container_image IS NOT NULL"""

    q["prefix_strip"] = f"""
SELECT namespace_name, pod_name, container_name,
       regexp_replace(container_id, '^[-_a-zA-Z0-9]+://', '') AS container_id_stripped
FROM {_aux("pod_containers_dim")}"""

    q["per_conv_stats"] = f"""
WITH {_enrich_ctes("transcripts")}
SELECT conv_id, COUNT(*) AS n_turns, CAST(MAX(turn_idx) AS INT) AS max_turn_idx,
       COUNT(DISTINCT namespace_name) AS n_sinks
FROM enriched GROUP BY 1"""

    # ------------------------------------------- training-data ops
    q["dedup_exact"] = """
WITH d AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(regexp_split_to_array(lower(trim(text)), '\\s+'), 1, 8), ' ')) AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint,
       MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep_id,
       doc_id <> MIN(doc_id) OVER (PARTITION BY fingerprint) AS is_dup
FROM d"""

    q["incremental_dedup"] = """
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
),
seen AS (SELECT fingerprint FROM fp WHERE doc_id % 4 = 0),
batch AS (SELECT * FROM fp WHERE doc_id % 4 <> 0),
keeper AS (
  SELECT doc_id, fingerprint
  FROM (SELECT doc_id, fingerprint,
               MIN(doc_id) OVER (PARTITION BY fingerprint) AS k
        FROM batch)
  WHERE doc_id = k
)
SELECT doc_id, fingerprint FROM keeper
WHERE fingerprint NOT IN (SELECT fingerprint FROM seen)"""

    # the bloom pre-filter is output-transparent (no false negatives;
    # positives still exactly anti-joined), so its oracle IS the plain
    # incremental_dedup SQL — passing the value gate proves that
    q["incremental_dedup_bloom"] = q["incremental_dedup"]

    q["token_stats"] = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       floor(length(regexp_replace(text, '\\s+', '', 'g')) * 1.0
             / len(regexp_split_to_array(trim(text), '\\s+')) * 10000) / 10000 AS avg_token_len
FROM documents"""

    stop_list = "'the','a','of','and','to','in','is','on','for','with'"
    q["quality"] = f"""
SELECT doc_id,
       floor((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))) * 1.0
             / length(text) * 10000) / 10000 AS punct_ratio,
       floor(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             t -> t IN ({stop_list}))) * 1.0
             / len(regexp_split_to_array(lower(trim(text)), '\\s+')) * 10000) / 10000
         AS stopword_ratio,
       length(text) >= 100 AS len_ok
FROM documents"""

    q["langid"] = """
SELECT doc_id, lang,
       CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                 t -> t IN ('the','a','of'))) >= 1
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM documents"""

    q["fingerprint"] = """
WITH n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents
)
SELECT doc_id, md5(norm) AS doc_fp,
       CAST(greatest(len(string_split(norm, ' ')) - 4, 0) AS BIGINT) AS n_shingles5
FROM n"""

    q["ngram_jaccard"] = f"""
WITH {_jaccard_ctes()}
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.55"""

    # connected-component keepers over the ngram_jaccard pair graph:
    # recursive-CTE transitive closure, keeper = min reachable id — the
    # set-based ground truth for the iterative Spark label propagation
    q["dedup_keepers"] = f"""
WITH RECURSIVE {_jaccard_ctes()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM jac WHERE jaccard >= 0.55
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM jac WHERE jaccard >= 0.55
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT d.doc_id,
       CAST(least(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT) AS keep_id,
       CAST(least(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) <> d.doc_id AS BOOLEAN) AS is_dup
FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
GROUP BY d.doc_id"""

    # end-to-end dedup composition: exact groups (normalized-md5) +
    # all-pairs Jaccard >= 0.5 among exact KEEPERS (matching the
    # engine's exact-then-LSH staging; shingle definition identical to
    # minhash_jaccard_verified), transitive closure, keeper = component
    # min. Valid because LSH recall is 1.0 at the gate sf (measured).
    q["dedup_pipeline"] = f"""
WITH RECURSIVE norm AS (
  SELECT doc_id, text,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
  FROM documents
),
ex AS (SELECT doc_id, f, MIN(doc_id) OVER (PARTITION BY f) AS k0 FROM norm),
keepers AS (
  SELECT n.doc_id, n.text FROM norm n JOIN ex e ON n.doc_id = e.doc_id
  WHERE e.doc_id = e.k0
),
{_jaccard_ctes(source="keepers", fallback=True)},
exact_edges AS (SELECT k0 AS u, doc_id AS v FROM ex WHERE doc_id <> k0),
edges AS (
  SELECT u, v FROM exact_edges
  UNION ALL SELECT v, u FROM exact_edges
  UNION ALL SELECT id_a, id_b FROM jac WHERE raw_j >= 0.5
  UNION ALL SELECT id_b, id_a FROM jac WHERE raw_j >= 0.5
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT d.doc_id,
       CAST(least(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT) AS keep_id,
       CAST(least(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) <> d.doc_id AS BOOLEAN) AS is_dup
FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
GROUP BY d.doc_id"""

    q["ann_topk"] = """
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM b WHERE vec_id < 5),
c AS (SELECT vec_id AS cand_id, v AS cv, nrm AS cn FROM b WHERE vec_id >= 5),
s AS (
  SELECT query_id, cand_id,
         floor(list_dot_product(qv, cv) / (qn * cn) * 10000) / 10000 AS sim
  FROM q CROSS JOIN c
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INT) AS rank
  FROM s
)
SELECT query_id, cand_id, sim, rank FROM r WHERE rank <= 10"""

    # the GEMM and all-probe-IVF engines are EXACT: one brute-force
    # oracle value-checks all three execution strategies
    q["ann_topk_gemm"] = q["ann_topk"]
    q["ann_topk_ivf"] = q["ann_topk"]

    q.update(_ops_oracles())
    q.update(_event_oracles())
    q.update(_grok_oracles())
    q.update(_quality_full_oracle())
    if aux_dir and aux_dir != AUX:
        q = {k: v.replace(AUX, aux_dir) for k, v in q.items()}
    return q


def _minhash_ctes(source: str = "documents") -> str:
    """CTE chain recomputing ops/dedup.minhash_signatures(
    shingle_hash="md5") plus the 16x4 LSH banding from raw text. Builds
    on _jaccard_ctes' sh CTE (the one shingle definition): 31-bit base
    hash = first 8 md5 hex chars mod 2^31-1 (bit-identical to Spark's
    conv(substring(md5..))), then the 64 affine-permutation mins with
    the SAME a/b coefficients the engine compiles in, then band rows as
    4-element list slices — candidates are pairs sharing any band."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import (
        _MERSENNE,
        _perm_params,
    )

    a, b = _perm_params()
    mins = ",\n         ".join(
        f"MIN((h * {int(a[i])} + {int(b[i])}) % {_MERSENNE}) AS m{i}"
        for i in range(64)
    )
    siglist = ", ".join(f"m{i}" for i in range(64))
    return f"""hh AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT) % {_MERSENNE} AS h
  FROM sh
),
msig AS (
  SELECT doc_id,
         {mins}
  FROM hh GROUP BY doc_id
),
mbands AS (
  SELECT doc_id, t.i AS band,
         list_slice([{siglist}], CAST(t.i * 4 + 1 AS INT), CAST(t.i * 4 + 4 AS INT)) AS bv
  FROM msig CROSS JOIN range(16) t(i)
),
mcand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM mbands a JOIN mbands c ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id
)"""


def _simhash_ctes(source: str = "documents") -> str:
    """CTE chain recomputing ops/dedup.simhash64(token_hash="md5") from
    raw text: tokenize (same \\s+ split), md5 halves as two 32-bit
    hashes (verified bit-identical to Spark's conv(substring(md5..)))),
    64 sign sums, sign bits reassembled into one int64. Bit 63 adds the
    min-long literal (1::BIGINT << 63 overflows DuckDB's checked
    shift); in two's complement that IS setting bit 63."""
    sums = ",\n         ".join(
        "SUM(CASE WHEN (({h} >> {sh}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}".format(
            h="hlo" if i < 32 else "hhi", sh=i % 32, i=i
        )
        for i in range(64)
    )
    bits = "\n    + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)" for i in range(63)
    )
    return f"""
simtoks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM {source}
),
simh AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT) AS hlo,
         CAST(('0x' || substring(md5(t), 9, 8)) AS BIGINT) AS hhi
  FROM simtoks
),
simbits AS (
  SELECT doc_id,
         {sums}
  FROM simh GROUP BY doc_id
),
simsig AS (
  SELECT doc_id,
    (CASE WHEN b63 > 0 THEN -9223372036854775808 ELSE 0 END)
    + {bits}
    AS simhash
  FROM simbits
)"""


def _ops_oracles() -> dict[str, str]:
    """Oracles for the ops queries — since round 4, EVERY driver query
    is value-gated (tests/test_contract.py asserts zero rows-only).
    The hash-chain queries run md5 token/shingle-hash variants that
    DuckDB recomputes bit-identically: minhash_pairs rebuilds the full
    64-min signature with the engine's affine constants and re-bands it
    (_minhash_ctes); simhash/simhash_pairs rebuild the 64-bit hash from
    md5 halves (_simhash_ctes); lsh_neardup re-projects the round(6)
    plane literals. The production xxhash64 paths are pinned to the md5
    variants by parity tests in tests/test_ops.py."""
    q: dict[str, str] = {}

    q["minhash_pairs"] = f"""
WITH {_jaccard_ctes(fallback=True)},
{_minhash_ctes()}
SELECT mcand.id_a, mcand.id_b, jac.jaccard
FROM mcand
JOIN jac ON jac.id_a = mcand.id_a AND jac.id_b = mcand.id_b
WHERE jac.raw_j >= 0.5"""

    q["simhash"] = f"""
WITH {_simhash_ctes()}
SELECT doc_id, simhash FROM simsig"""

    # Independent of the engine's banding: brute-force all-pairs
    # hamming over the recomputed hashes. Combo banding has recall 1
    # for hamming <= max_hamming by pigeonhole and no sf0.01 bucket
    # exceeds the cap, so the engine's banded+capped output must equal
    # this exactly — a dropped pair fails the value gate.
    q["simhash_pairs"] = f"""
WITH {_simhash_ctes()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM simsig a JOIN simsig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""

    # LSH-bucketed near-dup, recomputed end-to-end: the 6-decimal plane
    # literals come from the same _plane_literals the engine compiles
    # into its expression tree, the 16 sign bits and 8 two-bit bands are
    # rebuilt in SQL, and candidates are pairs sharing any (band, value)
    # — the engine's xxhash64 bucket-key folding is a pure shuffle-width
    # optimization whose collisions could only ADD candidates, and none
    # occur at this sf. Exact-cosine verify + threshold as in
    # neardup_brute (whose oracle already pins the float dot math).
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.similarity import (
        _plane_literals,
    )

    planes = _plane_literals(dim=64, n_planes=16)
    sig_terms = "\n    + ".join(
        "(CASE WHEN list_dot_product(v, [{lits}]) >= 0 THEN (1::BIGINT << {i}) ELSE 0 END)".format(
            lits=", ".join(repr(float(x)) for x in p), i=i
        )
        for i, p in enumerate(planes)
    )
    q["lsh_neardup"] = f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
sig AS (
  SELECT vec_id, v, nrm,
    {sig_terms}
    AS lsh_sig
  FROM b
),
bands AS (
  SELECT vec_id, t.i AS band, (lsh_sig >> (CAST(t.i AS INT) * 2)) & 3 AS bv
  FROM sig CROSS JOIN range(8) t(i)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
  FROM bands a JOIN bands c ON a.band = c.band AND a.bv = c.bv AND a.vec_id < c.vec_id
),
p AS (
  SELECT id_a, id_b,
         list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS raw_sim
  FROM cand JOIN sig x ON cand.id_a = x.vec_id JOIN sig y ON cand.id_b = y.vec_id
)
SELECT id_a, id_b, floor(raw_sim * 10000) / 10000 AS sim
FROM p WHERE raw_sim >= 0.2"""

    q["neardup_brute"] = """
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
p AS (
  SELECT a.vec_id id_a, c.vec_id id_b,
         floor(list_dot_product(a.v, c.v) / (a.nrm * c.nrm) * 10000) / 10000 AS sim
  FROM b a JOIN b c ON a.vec_id < c.vec_id
)
SELECT id_a, id_b, sim FROM p WHERE sim >= 0.2"""

    # Independent exact all-pairs Jaccard (ops/dedup.shingles definition:
    # distinct 3-gram word shingles, whole-text fallback for <3-token
    # docs). Checks the engine's LSH-candidate + verify output by VALUE:
    # passes only if the verify stage is exact and LSH recall is 1.0 at
    # this sf (measured; see q_minhash_jaccard_verified).
    q["minhash_jaccard_verified"] = f"""
WITH {_jaccard_ctes(fallback=True)}
SELECT id_a, id_b, jaccard FROM jac WHERE raw_j >= 0.5"""

    # argmax over stopword profiles, rebuilt from the ENGINE's own
    # profile dict so Spark and DuckDB extend in lockstep; WHEN order =
    # dict order (ties -> earlier profile), matching langid()'s
    # reversed-when-chain precedence.
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import (
        LANG_PROFILES as prof,
    )
    hits = {
        lang: (
            "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
            f"t -> t IN ({', '.join(repr(w) for w in ws)})))"
        )
        for lang, ws in prof.items()
    }
    best = "greatest(" + ", ".join(hits.values()) + ")"
    whens = " ".join(
        f"WHEN {hits[lang]} = best AND best > 0 THEN '{lang}'" for lang in prof
    )
    toks_l = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    stop_l = f"len(list_filter({toks_l}, t -> t IN ('the','a','of','and','to','is','in')))"
    punct_l = "(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))"
    distinct_l = f"(len(list_distinct({toks_l})) * 1.0 / len({toks_l}))"
    score_l = (
        f"LEAST(length(text) / 500.0, 1.0) * 0.3"
        f" + LEAST({stop_l} * 1.0 / len({toks_l}) * 5.0, 1.0) * 0.2"
        f" + (1.0 - LEAST({punct_l} * 1.0 / length(text) * 4.0, 1.0)) * 0.2"
        f" + LEAST({distinct_l} * 1.5, 1.0) * 0.3"
    )
    # the curation funnel: floored-quality gate -> profile-argmax lang
    # gate -> exact-dedup keeper window, all recomputed from raw text
    q["corpus_curation"] = f"""
WITH scored AS (
  SELECT doc_id,
         CASE {whens} ELSE 'unk' END AS lang_pred,
         floor(({score_l}) * 10000) / 10000 AS q4,
         CAST(len({toks_l}) AS BIGINT) AS n_tokens_ws,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM (SELECT doc_id, text, {best} AS best FROM documents)
),
kept AS (
  SELECT * FROM scored WHERE q4 >= 0.5 AND lang_pred IN ('en')
),
kw AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS k0 FROM kept
)
SELECT doc_id, lang_pred, q4, n_tokens_ws FROM kw WHERE doc_id = k0"""

    # budgeted selection: windowed cumulative sum over the same total
    # order the engine's two-phase distributed prefix sum uses
    q["token_budget"] = f"""
WITH d AS (
  SELECT doc_id,
         floor(({score_l}) * 10000) / 10000 AS q4,
         CAST(len({toks_l}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, q4, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY q4 DESC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM d
)
SELECT doc_id, q4, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 10000"""

    # seed-similarity quality scoring: max cosine to the seed slice,
    # same double-fold dot/norm arithmetic as the ann/neardup oracles
    q["seed_similarity"] = """
WITH d AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
),
s AS (SELECT v, nrm FROM d WHERE vec_id % 101 = 0),
m AS (
  SELECT d.vec_id,
         MAX(list_dot_product(d.v, s.v) / (d.nrm * s.nrm)) AS best
  FROM d CROSS JOIN s GROUP BY 1
)
SELECT vec_id, floor(best * 10000) / 10000 AS seed_sim4 FROM m"""

    # concat-and-chunk packing: global offsets by windowed running sum
    q["pack_sequences"] = f"""
WITH d AS (
  SELECT doc_id, CAST(len({toks_l}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM d
)
SELECT doc_id, n_tokens, cum - n_tokens AS start_offset,
       (cum - n_tokens) // 512 AS bin_id
FROM c"""

    # shuffled packing: same layout over the deterministic hash order
    # (md5 unit-hash, id tiebreak) instead of id order
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import DENOM

    _pack_u = (
        f"(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':5'),"
        f" 1, 8) AS BIGINT) % {DENOM}) / {float(DENOM)!r}"
    )
    q["pack_shuffled"] = f"""
WITH d AS (
  SELECT doc_id, CAST(len({toks_l}) AS BIGINT) AS n_tokens,
         {_pack_u} AS u
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY u ASC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM d
)
SELECT doc_id, n_tokens, cum - n_tokens AS start_offset,
       (cum - n_tokens) // 512 AS bin_id
FROM c"""

    # the COMPLETE funnel: curation keepers ∩ repetition gate ∩
    # decontamination gate -> windowed token budget over survivors
    q["full_curation"] = f"""
WITH scored AS (
  SELECT doc_id,
         CASE {whens} ELSE 'unk' END AS lang_pred,
         floor(({score_l}) * 10000) / 10000 AS q4,
         CAST(len({toks_l}) AS BIGINT) AS n_tokens,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM (SELECT doc_id, text, {best} AS best FROM documents)
),
kept AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS k0
  FROM scored WHERE q4 >= 0.5 AND lang_pred IN ('en')
),
keepers AS (SELECT doc_id, q4, n_tokens FROM kept WHERE doc_id = k0),
rtk AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents
),
big AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
  FROM rtk, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
),
bigc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM big GROUP BY 1, 2),
-- engine's repetition_signals emits top2_frac = 0.0 for docs with no
-- bigram (< 2 tokens), which PASSES the gate; derive rep_ok from ALL
-- docs with COALESCE so such degenerate docs are not silently excluded
repf AS (
  SELECT doc_id, floor(MAX(cnt) * 1.0 / SUM(cnt) * 10000) / 10000 AS frac
  FROM bigc GROUP BY 1
),
rep_ok AS (
  SELECT d.doc_id FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN repf r USING (doc_id)
  WHERE COALESCE(r.frac, 0) <= 0.15
),
{_jaccard_ctes(fallback=True)},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
hits AS (
  SELECT s.doc_id, COUNT(ev.shingle) AS n_hits
  FROM sh s LEFT JOIN ev USING (shingle)
  GROUP BY 1
),
dec_ok AS (
  SELECT h.doc_id FROM hits h JOIN sizes z USING (doc_id)
  WHERE (h.n_hits * 1.0 / z.sz) < 0.5
),
surv AS (
  SELECT k.doc_id, k.q4, k.n_tokens FROM keepers k
  JOIN rep_ok USING (doc_id) JOIN dec_ok USING (doc_id)
),
cum AS (
  SELECT doc_id, q4, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY q4 DESC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM surv
)
SELECT doc_id, q4, n_tokens, cum_tokens FROM cum WHERE cum_tokens <= 8000"""

    # benchmark decontamination: per-doc fraction of distinct shingles
    # found in the eval slice's shingle set — raw-string probe, so the
    # whole chain is recomputed from text here; the contaminated flag
    # compares the exact integer ratio (one correctly-rounded division
    # on both engines)
    q["decontaminate"] = f"""
WITH {_jaccard_ctes(fallback=True)},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
hits AS (
  SELECT s.doc_id, COUNT(ev.shingle) AS n_hits
  FROM sh s LEFT JOIN ev USING (shingle)
  GROUP BY 1
)
SELECT h.doc_id, z.sz AS n_shingles, CAST(h.n_hits AS BIGINT) AS n_hits,
       floor(h.n_hits * 1.0 / z.sz * 10000) / 10000 AS overlap4,
       (h.n_hits * 1.0 / z.sz) >= 0.5 AS contaminated
FROM hits h JOIN sizes z USING (doc_id)
WHERE h.n_hits > 0"""

    # paragraph-level (sub-document) dedup: 10-word pseudo-paragraph
    # chunking, cross-doc frequency on the normalized-content md5, docs
    # reassembled keeping only df<=1 paragraphs in original order
    q["paragraph_dedup"] = """
WITH ptoks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents
),
paras AS (
  SELECT doc_id, i AS pos,
         array_to_string(tk[((i-1)*10+1):((i-1)*10+10)], ' ') AS para
  FROM ptoks,
       unnest(generate_series(1, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS t(i)
),
pf AS (
  SELECT doc_id, pos, para,
         md5(regexp_replace(lower(trim(para)), '\\s+', ' ', 'g')) AS fp
  FROM paras
),
dfreq AS (SELECT fp, COUNT(DISTINCT doc_id) AS pdf FROM pf GROUP BY 1)
SELECT doc_id,
       COALESCE(string_agg(para, e'\\n\\n' ORDER BY pos)
                FILTER (WHERE pdf <= 1), '') AS clean_text,
       COUNT(*) FILTER (WHERE pdf <= 1) AS n_kept,
       COUNT(*) FILTER (WHERE pdf > 1) AS n_dropped
FROM pf JOIN dfreq USING (fp)
GROUP BY 1"""

    # exact substring dedup: duplicated 8-token windows merged into
    # maximal spans (gaps-and-islands), docs rebuilt from tokens outside
    # the spans — the oracle counts raw window STRINGS where the engine
    # hashes the token tuples (same classes: tokens are space-free)
    # shared between the "all" policy and "keep_first" (the paper's
    # all-but-one form): only the dup CTE differs — keep_first excludes
    # the (doc_id, pos)-smallest occurrence per duplicated window
    _substr_tmpl = """
WITH tks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents
),
wins AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+7], ' ') AS win
  FROM tks, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)
),
DUP_CTE
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (
              PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM dup
),
isl2 AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
),
spans AS (SELECT doc_id, island, MIN(pos) AS a, MAX(pos) + 8 AS b FROM isl2 GROUP BY 1, 2),
toks AS (
  SELECT doc_id, i - 1 AS p, w[i] AS tok
  FROM tks, unnest(generate_series(1, len(w))) AS t(i)
),
keep AS (
  SELECT t.doc_id, t.p, t.tok FROM toks t
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = t.doc_id AND t.p >= s.a AND t.p < s.b)
),
kept_agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text, COUNT(*) AS n_kept
  FROM keep GROUP BY 1
),
nsp AS (SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY 1),
base AS (SELECT doc_id, len(w) AS n FROM tks)
SELECT b.doc_id,
       COALESCE(ka.clean_text, '') AS clean_text,
       CAST(b.n AS BIGINT) AS n_tokens,
       CAST(b.n - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_dup_tokens,
       CAST(COALESCE(nsp.n_spans, 0) AS BIGINT) AS n_spans
FROM base b
LEFT JOIN kept_agg ka USING (doc_id)
LEFT JOIN nsp USING (doc_id)"""
    q["substring_dedup"] = _substr_tmpl.replace("DUP_CTE", """\
freq AS (SELECT win FROM wins GROUP BY 1 HAVING COUNT(*) >= 2),
dup AS (SELECT doc_id, pos FROM wins JOIN freq USING (win)),""")
    q["substring_keep_first"] = _substr_tmpl.replace("DUP_CTE", """\
dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn,
           COUNT(*) OVER (PARTITION BY win) AS wc
    FROM wins)
  WHERE wc >= 2 AND rn > 1
),""")

    # Gopher-style repetition: most-frequent-n-gram fraction per doc
    # for n=1,2,3; docs shorter than n tokens score 0.0 for that n
    rep_cols = ", ".join(
        f"floor(COALESCE(MAX(CASE WHEN n = {n} THEN frac END), 0) * 10000) / 10000"
        f" AS top{n}_frac4"
        for n in (1, 2, 3)
    )
    q["repetition"] = f"""
WITH rtk AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents
),
g AS (
  SELECT doc_id, 1 AS n, w[i] AS gram
  FROM rtk, unnest(generate_series(1, len(w))) AS t(i)
  UNION ALL
  SELECT doc_id, 2, w[i] || ' ' || w[i+1]
  FROM rtk, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
  UNION ALL
  SELECT doc_id, 3, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
  FROM rtk, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
),
c AS (SELECT doc_id, n, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3),
a AS (SELECT doc_id, n, MAX(cnt) * 1.0 / SUM(cnt) AS frac FROM c GROUP BY 1, 2)
SELECT doc_id, {rep_cols} FROM a GROUP BY 1"""

    # PII scrubbing: the oracle replays the op's exact pattern sequence
    # (ONE definition in ops.text.PII_PATTERNS; Java-regex and RE2 agree
    # on these constructs) over identically planted synthetic PII
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import PII_PATTERNS

    pii_plant = (
        "text || CASE WHEN doc_id % 7 = 0 THEN"
        " ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'"
        " || CAST(doc_id % 256 AS VARCHAR)"
        " || '.99 card 4111111111111111 tel +1 555-200-3000'"
        " ELSE '' END"
    )
    pii_counts, cur = [], "t"
    for kind, pat in PII_PATTERNS.items():
        pii_counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT) AS n_{kind}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '[{kind.upper()}]', 'g')"
    q["redact_pii"] = f"""
SELECT doc_id, {", ".join(pii_counts)}, {cur} AS redacted_text
FROM (SELECT doc_id, {pii_plant} AS t FROM documents)"""

    # deterministic sampling/splitting: the md5 unit-hash is the
    # round-4-proven bit-identical chain; boundaries come from the SAME
    # split_boundaries helper the operator uses, repr'd into SQL so the
    # cumulative-float comparison is bit-equal on both engines
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import (
        DENOM,
        normalized_targets,
        split_boundaries,
    )

    def _u_sql(seed: int) -> str:
        return (
            f"(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{seed}'),"
            f" 1, 8) AS BIGINT) % {DENOM}) / {float(DENOM)!r}"
        )

    bounds = split_boundaries({"train": 0.8, "val": 0.1, "test": 0.1})
    whens_split = " ".join(
        f"WHEN u < {ub!r} THEN '{name}'" for name, ub in bounds[:-1]
    )
    q["hash_split"] = f"""
SELECT doc_id, CASE {whens_split} ELSE '{bounds[-1][0]}' END AS split
FROM (SELECT doc_id, {_u_sql(42)} AS u FROM documents)"""

    q["sample_k"] = f"""
SELECT doc_id, lang
FROM (SELECT doc_id, lang, {_u_sql(11)} AS u FROM documents)
ORDER BY u, doc_id LIMIT 100"""

    q["stratified_sample"] = f"""
SELECT doc_id, lang
FROM (SELECT doc_id, lang, {_u_sql(7)} AS u,
             CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END AS frac
      FROM documents)
WHERE u < frac"""

    # unigram-LM quality: vocabulary + total recomputed from the data,
    # top-32 cut with the (cnt desc, tok asc) tiebreak, mean NLL on the
    # floored grid (absorbs log/avg last-ulp differences)
    q["lm_score"] = """
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents
),
v AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM v),
topk AS (SELECT tok, cnt FROM v ORDER BY cnt DESC, tok LIMIT 32),
s AS (
  SELECT tk.doc_id,
         -ln(COALESCE(CAST(topk.cnt AS DOUBLE), 0.5) / (SELECT t FROM tot)) AS nll
  FROM tk LEFT JOIN topk USING (tok)
)
SELECT doc_id, floor(avg(nll) * 10000) / 10000 AS lm_nll,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM s GROUP BY doc_id"""

    # interpolated bigram LM: both vocabularies recomputed from the
    # data with the (cnt desc, token asc) tiebreaks; the bigram
    # conditional divides by prev's FULL unigram count; (1 - 0.8) is
    # written as the subtraction (NOT the literal 0.2 — one ulp apart
    # from the engine's 1.0 - lam); docs with <2 tokens are absent
    _lm2 = """
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
  FROM documents
),
uni AS (SELECT doc_id, unnest(a) AS cur FROM tk),
v AS (SELECT cur, CAST(count(*) AS BIGINT) AS cnt FROM uni GROUP BY cur),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM v),
utop AS (SELECT cur, cnt FROM v ORDER BY cnt DESC, cur LIMIT 32),
pairs AS (
  SELECT doc_id, a[i-1] AS prev, a[i] AS cur
  FROM tk, unnest(generate_series(2, len(a))) AS g(i)
  WHERE len(a) >= 2
),
btop AS (
  SELECT prev, cur, count(*) AS bcnt FROM pairs GROUP BY prev, cur
  ORDER BY count(*) DESC, prev, cur LIMIT 32
),
btbl AS (
  SELECT b.prev, b.cur, CAST(b.bcnt AS DOUBLE) / v.cnt AS pbig
  FROM btop b JOIN v ON v.cur = b.prev
),
s AS (
  SELECT p.doc_id,
         -ln(0.8 * COALESCE(btbl.pbig, 0.0)
             + (1 - 0.8) * (COALESCE(CAST(utop.cnt AS DOUBLE), 0.5)
                            / (SELECT t FROM tot))) AS nll
  FROM pairs p
  LEFT JOIN btbl ON p.prev = btbl.prev AND p.cur = btbl.cur
  LEFT JOIN utop ON p.cur = utop.cur
)
SELECT doc_id, floor(avg(nll) * 10000) / 10000 AS lm_nll2,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY doc_id"""
    q["lm_score2"] = _lm2

    # CCNet head/middle/tail: tertiles from the SAME deterministic
    # md5-hash-order sample the engine uses (sample_n smallest hashes),
    # indexed at the same ceil(n/3) order statistics; scores are
    # grid-floored so the threshold compares are exact
    q["perplexity_buckets"] = f"""
WITH s2 AS ({_lm2}),
samp AS (
  SELECT lm_nll2
  FROM (SELECT doc_id, lm_nll2, {_u_sql(17)} AS u FROM s2)
  ORDER BY u, doc_id LIMIT 999
),
arr AS (SELECT list_sort(list(lm_nll2)) AS v FROM samp),
th AS (SELECT v[CAST(ceil(len(v) / 3.0) AS BIGINT)] AS t1,
              v[CAST(ceil(2 * len(v) / 3.0) AS BIGINT)] AS t2
       FROM arr)
SELECT doc_id, lm_nll2,
       CASE WHEN lm_nll2 <= (SELECT t1 FROM th) THEN 'head'
            WHEN lm_nll2 <= (SELECT t2 FROM th) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM s2"""

    # C4-style line cleaning over the same 8-word pseudo-line chunking
    # with the md5-coin terminal period; line gate = >=5 words AND
    # terminal punctuation, page gate = >=3 surviving lines
    q["clean_lines"] = """
WITH ptoks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
raw AS (
  SELECT doc_id, i AS pos, array_to_string(tk[((i-1)*8+1):((i-1)*8+8)], ' ') AS ch
  FROM ptoks,
       unnest(generate_series(1, CAST(ceil(len(tk) / 8.0) AS BIGINT))) AS t(i)
),
lines AS (
  SELECT doc_id, pos,
         ch || CASE WHEN substring(md5(ch), 1, 1) < '8' THEN '.' ELSE '' END AS line
  FROM raw
),
k AS (
  SELECT doc_id, pos, line,
         (len(regexp_split_to_array(trim(line), '\\s+')) >= 5
          AND regexp_matches(trim(line), '[.!?"]$')) AS kp
  FROM lines
)
SELECT doc_id,
       COALESCE(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE kp), '') AS clean_text,
       COUNT(*) FILTER (WHERE kp) AS n_kept,
       COUNT(*) FILTER (WHERE NOT kp) AS n_dropped,
       (COUNT(*) FILTER (WHERE kp)) >= 3 AS keep
FROM k GROUP BY doc_id"""

    # token-weighted domain mixing: masses recomputed from the data,
    # T = min(mass/share) (binding domain kept whole), rate arithmetic
    # mirrors the operator's (share * t) / mass exactly (IEEE doubles
    # with identical operand order), keep decided on the shared md5
    # unit-hash grid
    shares = normalized_targets({"en": 0.6, "de": 0.25, "fr": 0.15})
    shares_vals = ", ".join(f"('{d}', {s!r})" for d, s in shares.items())
    q["domain_mix"] = f"""
WITH w AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tok,
         {_u_sql(13)} AS u
  FROM documents
),
sh(d, share) AS (SELECT * FROM (VALUES {shares_vals})),
m AS (SELECT lang, CAST(SUM(tok) AS DOUBLE) AS mass FROM w GROUP BY lang),
r AS (
  SELECT lang, (share * (SELECT MIN(mass / share) FROM m JOIN sh ON m.lang = sh.d)) / mass AS rate
  FROM m JOIN sh ON m.lang = sh.d
)
SELECT w.doc_id, w.lang FROM w JOIN r ON w.lang = r.lang WHERE w.u < r.rate"""

    # UniMax epoch-capped waterfill in closed form: caps sorted
    # ascending (ties by lang), window prefix sums in that order, the
    # saturation test written B - (pc - cap) exactly as the engine's
    # driver loop writes it (IEEE: pc - cap is NOT the previous prefix
    # sum), fair share from the k-th running prefix, rates clamped at 1
    # and floored to the 1e-4 grid before the md5 hash gate
    q["unimax_mix"] = f"""
WITH w AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS tok,
         {_u_sql(29)} AS u
  FROM documents
),
m AS (SELECT lang, CAST(SUM(tok) AS DOUBLE) AS mass FROM w GROUP BY lang),
o AS (SELECT lang, mass, mass * 0.9 AS cap,
             ROW_NUMBER() OVER (ORDER BY mass * 0.9, lang) AS i,
             SUM(mass * 0.9) OVER (ORDER BY mass * 0.9, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
             (SELECT COUNT(*) FROM m) AS n
      FROM m),
kk AS (SELECT COALESCE(MAX(i), 0) AS k FROM o
       WHERE cap * (n - i + 1) <= 15000.0 - (pc - cap)),
pk AS (SELECT COALESCE((SELECT pc FROM o, kk WHERE o.i = kk.k), 0.0) AS p),
r AS (SELECT lang,
             floor(LEAST(
               CASE WHEN i <= (SELECT k FROM kk) THEN cap
                    ELSE (15000.0 - (SELECT p FROM pk))
                         / (n - (SELECT k FROM kk)) END / mass,
               1.0) * 10000) / 10000 AS rate
      FROM o)
SELECT w.doc_id, w.lang FROM w JOIN r ON w.lang = r.lang WHERE w.u < r.rate"""

    # span-level decontamination: same 10-word chunking; chunks whose
    # normalized fingerprint appears in the eval slice are scrubbed
    q["paragraph_scrub"] = """
WITH ptoks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents
),
paras AS (
  SELECT doc_id, i AS pos,
         array_to_string(tk[((i-1)*10+1):((i-1)*10+10)], ' ') AS para
  FROM ptoks,
       unnest(generate_series(1, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS t(i)
),
pf AS (
  SELECT doc_id, pos, para,
         md5(regexp_replace(lower(trim(para)), '\\s+', ' ', 'g')) AS fp
  FROM paras
),
bad AS (SELECT DISTINCT fp AS bfp FROM pf WHERE doc_id % 97 = 0)
SELECT doc_id,
       COALESCE(string_agg(para, e'\\n\\n' ORDER BY pos)
                FILTER (WHERE bfp IS NULL), '') AS clean_text,
       COUNT(*) FILTER (WHERE bfp IS NULL) AS n_kept,
       COUNT(*) FILTER (WHERE bfp IS NOT NULL) AS n_scrubbed
FROM pf LEFT JOIN bad ON pf.fp = bad.bfp
GROUP BY 1"""

    # SemDeDup (n_iter=0 variant): seed centroids = the 8 smallest
    # md5(id) vectors, assignment = argmin of the 1e-4-floored squared
    # distance (lowest centroid index on ties — Spark's array_position
    # first-occurrence), drop rule = floored within-cluster cosine
    q["semantic_dedup"] = """
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
seeds AS (
  SELECT v AS cv, CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS INT) AS ci
  FROM b ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
),
d AS (
  SELECT b.vec_id, b.v, s.ci,
         floor(list_sum(list_transform(range(1, 65),
               i -> (b.v[i] - s.cv[i]) * (b.v[i] - s.cv[i]))) * 10000) / 10000 AS dist
  FROM b CROSS JOIN seeds s
),
asg AS (
  SELECT vec_id, v, ci AS c FROM
    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, ci) AS rn FROM d)
  WHERE rn = 1
),
nv AS (
  SELECT vec_id, c,
         CASE WHEN n > 0 THEN list_transform(v, x -> x / n) ELSE v END AS vn
  FROM (SELECT *, sqrt(list_dot_product(v, v)) AS n FROM asg)
),
pairs AS (
  SELECT a.vec_id AS ida, bb.vec_id AS idb,
         floor(list_dot_product(a.vn, bb.vn) * 10000) / 10000 AS sim
  FROM nv a JOIN nv bb ON a.c = bb.c AND a.vec_id < bb.vec_id
),
dropped AS (SELECT DISTINCT idb FROM pairs WHERE sim >= 0.2)
SELECT asg.vec_id, asg.c AS cluster, (dropped.idb IS NULL) AS keep
FROM asg LEFT JOIN dropped ON asg.vec_id = dropped.idb"""

    # cluster_sample: same seed-quantizer replay as semantic_dedup
    # (k smallest md5(id) vectors, floored-grid distance, lowest-index
    # tie), then the per-cluster outlier rank (dist desc, id asc)
    q["cluster_sample"] = """
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seeds AS (
  SELECT v AS cv, CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS INT) AS ci
  FROM b ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8
),
d AS (
  SELECT b.vec_id, s.ci,
         floor(list_sum(list_transform(range(1, 65),
               i -> (b.v[i] - s.cv[i]) * (b.v[i] - s.cv[i]))) * 10000) / 10000 AS dist
  FROM b CROSS JOIN seeds s
),
asg AS (
  SELECT vec_id, dist, ci AS cluster FROM
    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, ci) AS rn FROM d)
  WHERE rn = 1
)
SELECT vec_id, cluster, dist,
       CAST(row_number() OVER (PARTITION BY cluster ORDER BY dist DESC, vec_id) AS INT) AS "rank",
       (row_number() OVER (PARTITION BY cluster ORDER BY dist DESC, vec_id)) <= 16 AS keep
FROM asg"""

    # tfidf_terms: tf and document frequency recomputed from scratch,
    # score floored to the 1e-4 grid BEFORE the rank so both engines
    # order identically despite last-ulp ln() differences
    q["tfidf_terms"] = """
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY term),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
         floor(tf.tf * ln((SELECT n FROM nd) / df_docs) * 10000) / 10000 AS tfidf
  FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, term, tf, df_docs, tfidf, CAST(rn AS INT) AS "rank"
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM s)
WHERE rn <= 3"""

    # ngram_stats: same two-level aggregation (within-doc collapse then
    # gram-grain sum/count), deterministic (occurrences desc, gram asc)
    # top-k cut
    q["ngram_stats"] = """
WITH tk AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents),
g AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
  FROM tk, unnest(generate_series(1, len(t) - 1)) AS s(i)
  WHERE len(t) >= 2
),
pd AS (SELECT gram, doc_id, count(*) AS c FROM g GROUP BY gram, doc_id),
st AS (SELECT gram, CAST(sum(c) AS BIGINT) AS occurrences,
              CAST(count(*) AS BIGINT) AS n_docs FROM pd GROUP BY gram)
SELECT gram, occurrences, n_docs FROM st ORDER BY occurrences DESC, gram LIMIT 50"""

    # DSIR: hashed uni+bigram feature counts on both sides, Laplace-1
    # smoothed log ratio per bucket, per-doc sum on the floored grid;
    # the select variant adds the md5 inverse-CDF Gumbel key. Feature
    # buckets use the same '0x'||md5-prefix parse as unit_hash.
    _dsir_w = """
WITH tk AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents),
f1 AS (SELECT doc_id, unnest(t) AS gram FROM tk),
f2 AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
       FROM tk, unnest(generate_series(1, len(t) - 1)) AS s(i) WHERE len(t) >= 2),
feats AS (
  SELECT doc_id, CAST('0x' || substring(md5(gram), 1, 8) AS BIGINT) % 256 AS b
  FROM (SELECT * FROM f1 UNION ALL SELECT * FROM f2)
),
tgt AS (SELECT b FROM feats WHERE doc_id % 13 = 0),
rc AS (SELECT b, count(*) AS rc FROM feats GROUP BY b),
tc AS (SELECT b, count(*) AS tc FROM tgt GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM feats) AS rt, (SELECT count(*) FROM tgt) AS tt),
ratio AS (
  SELECT COALESCE(rc.b, tc.b) AS b,
         ln((COALESCE(tc, 0) + 1.0) / ((SELECT tt FROM tot) + 1.0 * 256))
         - ln((COALESCE(rc, 0) + 1.0) / ((SELECT rt FROM tot) + 1.0 * 256)) AS lr
  FROM rc FULL OUTER JOIN tc ON rc.b = tc.b
),
w AS (
  SELECT feats.doc_id, floor(sum(lr) * 10000) / 10000 AS logw,
         CAST(count(*) AS BIGINT) AS n_feats
  FROM feats JOIN ratio USING (b) GROUP BY feats.doc_id
)
"""
    q["dsir_weights"] = _dsir_w + "SELECT doc_id, logw, n_feats FROM w"

    q["dsir_select"] = _dsir_w + f"""
, g AS (
  SELECT doc_id, logw, n_feats,
         ((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':g42'), 1, 8) AS BIGINT)
           % {DENOM}) + 0.5) / {float(DENOM)!r} AS u
  FROM w)
SELECT doc_id, logw, n_feats,
       floor((logw - ln(-ln(u))) * 10000) / 10000 AS gumbel_key
FROM g ORDER BY gumbel_key DESC, doc_id LIMIT 200"""

    q["langid_profiles"] = f"""
WITH h AS (SELECT doc_id, lang, text, {best} AS best FROM documents)
SELECT doc_id, lang, CASE {whens} ELSE 'unk' END AS lang_pred FROM h"""

    bpe = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
    bpe_sql = bpe.replace("'", "''")
    q["token_bpe"] = f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens_ws,
       CAST(len(list_filter(regexp_extract_all(text, '{bpe_sql}'), t -> t <> '')) AS BIGINT) AS n_tokens_bpe,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""

    # media_features: recompute the mapInPandas feature extraction in
    # pure integer SQL from the SAME bytes (documents text is verified
    # ASCII, so ord(char) == utf-8 byte). Chunking replicates
    # np.array_split(a, 8): chunk j has size n//8 (+1 for j < n%8),
    # start j*(n//8) + min(j, n%8); feature = basis points of the chunk
    # byte mean via exact integer floor-division — no float grid hazard.
    def _fj(j: int) -> str:
        size = f"(n // 8 + CASE WHEN {j} < n % 8 THEN 1 ELSE 0 END)"
        start = f"((n // 8) * {j} + least({j}, n % 8))"
        return (
            f"CAST(CASE WHEN {size} = 0 THEN 0 ELSE "
            f"list_sum(bs[{start} + 1 : {start} + {size}]) * 10000 // ({size} * 255) "
            f"END AS BIGINT) AS f{j}"
        )

    feats = ",\n       ".join(_fj(j) for j in range(8))
    q["media_features"] = f"""
WITH base AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS payload_hash,
         list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1))) AS bs,
         length(text) AS n
  FROM documents
  -- the chunking below indexes CHARACTERS; it equals the engine's BYTE
  -- chunking only while the text is pure ASCII. Fail loudly the moment
  -- a data refresh breaks that invariant instead of hash-mismatching.
  WHERE CASE WHEN octet_length(encode(text)) = length(text) THEN TRUE
             ELSE error('media_features oracle requires ASCII text (char chunking != byte chunking)') END
)
SELECT media_id, kind, n_bytes, payload_hash,
       {feats}
FROM base"""

    # perceptual hash: 64-cell grid (np.array_split boundaries, exact
    # integer basis points), floored integer mean, aHash bit i when
    # cell i strictly above the mean, packed into a signed int64 (bit
    # 63 = min-long two's-complement term). Same ASCII guard as
    # media_features — char chunking must equal byte chunking.
    _phash_grid = """
SELECT doc_id AS media_id,
       ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       list_transform(generate_series(0, 63), j ->
         CAST(CASE WHEN (n // 64 + CASE WHEN j < n % 64 THEN 1 ELSE 0 END) = 0 THEN 0
              ELSE list_sum(bs[((n // 64) * j + least(j, n % 64)) + 1 :
                               ((n // 64) * j + least(j, n % 64))
                               + (n // 64 + CASE WHEN j < n % 64 THEN 1 ELSE 0 END)])
                   * 10000 // ((n // 64 + CASE WHEN j < n % 64 THEN 1 ELSE 0 END) * 255)
              END AS BIGINT)) AS g
FROM (
  SELECT doc_id,
         list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1))) AS bs,
         length(text) AS n
  FROM documents
  WHERE CASE WHEN octet_length(encode(text)) = length(text) THEN TRUE
             ELSE error('media_phash oracle requires ASCII text') END
)"""
    _phash = f"""
grid AS ({_phash_grid}),
ph AS (
  SELECT media_id, kind,
         CAST((SELECT SUM(CASE WHEN g[i+1] > CAST(floor(list_sum(g) / 64.0) AS BIGINT)
                          THEN CASE WHEN i = 63 THEN -9223372036854775808
                               ELSE (1::BIGINT << i) END
                          ELSE 0 END)
               FROM unnest(generate_series(0, 63)) AS t(i)) AS BIGINT) AS phash
  FROM grid
)"""
    q["media_phash"] = f"""
WITH {_phash}
SELECT media_id, kind, phash FROM ph"""

    q["media_neardup"] = f"""
WITH {_phash}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.media_id < b.media_id
WHERE CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) <= 6"""

    # media_frames: kind == 'video' <=> doc_id % 3 == 2; duration
    # (doc_id % 10 + 1) seconds -> one frame per 1000 ms from 0
    q["media_frames"] = """
SELECT doc_id AS media_id, CAST(t.f * 1000 AS BIGINT) AS frame_ts_ms
FROM documents, unnest(generate_series(0, CAST(doc_id % 10 AS INT))) AS t(f)
WHERE doc_id % 3 = 2"""

    return q


def _event_oracles() -> dict[str, str]:
    q: dict[str, str] = {}
    q["events_json"] = """
SELECT event_id, event_type,
       CAST(json_extract(props, '$.k') AS INT) AS props_k
FROM events"""

    q["events_window"] = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       floor(SUM(value) * 10000) / 10000 AS sum_value
FROM events GROUP BY 1, 2"""

    q["pricing_summary"] = """
-- emitted columns are exact scaled BIGINTs (cents / basis points):
-- decimal128 does not survive the driver's Arrow hash canonicalization
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_c100,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price_c100,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_disc_price_bp,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-03'
GROUP BY 1, 2"""

    q["order_revenue"] = """
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_bp
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate >= TIMESTAMP '1998-06-02'
GROUP BY 1, 2"""

    q["events_sessionize"] = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  -- CAST: DuckDB's windowed SUM(int) widens to HUGEINT (int128); the
  -- driver's hasher canonicalizes Arrow types, so int128 != Spark's
  -- int64 even when every value is equal. BIGINT matches Spark's
  -- sum-over-window output type exactly.
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY 1, 2"""
    return q


def _grok_oracles() -> dict[str, str]:
    from fluent_plugin_kubernetes_metadata_filter_spark.grok import APACHE_COMBINED, compile_grok

    regex, gi = compile_grok(APACHE_COMBINED)
    rx = regex.replace("'", "''")
    fields = ["clientip", "verb", "request", "response", "bytes"]
    cols = ",\n       ".join(
        f"CASE WHEN regexp_matches(line, '{rx}') THEN regexp_extract(line, '{rx}', {gi[f]}) END AS {f}"
        for f in fields
    )
    q = {}
    q["grok_apache"] = f"""
SELECT log_id, {cols},
       regexp_matches(line, '{rx}') AS grok_matched
FROM read_parquet('{AUX}/logs.parquet')"""
    q["grok_status_counts"] = f"""
SELECT COALESCE(CASE WHEN regexp_matches(line, '{rx}')
                     THEN regexp_extract(line, '{rx}', {gi["response"]}) END,
                '__unparsed__') AS status,
       COUNT(*) AS n_requests
FROM read_parquet('{AUX}/logs.parquet') GROUP BY 1"""
    return q


def _quality_full_oracle() -> dict[str, str]:
    toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    stop = f"len(list_filter({toks}, t -> t IN ('the','a','of','and','to','is','in')))"
    punct = "(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))"
    distinct_ratio = f"(len(list_distinct({toks})) * 1.0 / len({toks}))"
    score = (
        f"LEAST(length(text) / 500.0, 1.0) * 0.3"
        f" + LEAST({stop} * 1.0 / len({toks}) * 5.0, 1.0) * 0.2"
        f" + (1.0 - LEAST({punct} * 1.0 / length(text) * 4.0, 1.0)) * 0.2"
        f" + LEAST({distinct_ratio} * 1.5, 1.0) * 0.3"
    )
    return {
        "quality_full": f"""
SELECT doc_id,
       floor(({score}) * 10000) / 10000 AS quality_score,
       floor({distinct_ratio} * 10000) / 10000 AS distinct_token_ratio
FROM documents"""
    }
