"""Named queries over the engine — the driver-facing surface.

Each function takes (spark, sf_dir) and returns a DataFrame whose column
names match the DuckDB oracle in oracle.py exactly (the driver hashes
values under sorted column names). Keep every output scalar-typed or a
deterministic string rendering of nested data; floats go through
``floor(x*10^k)/10^k`` so both engines bit-agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fluent_plugin_kubernetes_metadata_filter_spark.config import PipelineConfig
from fluent_plugin_kubernetes_metadata_filter_spark import pipeline
from fluent_plugin_kubernetes_metadata_filter_spark.enrich import enrich
from fluent_plugin_kubernetes_metadata_filter_spark.io import load_table
from fluent_plugin_kubernetes_metadata_filter_spark.parse import extract_source_fields
from fluent_plugin_kubernetes_metadata_filter_spark.route import (
    PASSTHROUGH,
    per_sink_counts,
    salted_repartition,
    stable_order,
)

ANNOT_CFG = PipelineConfig(annotation_match=("custom.+", "^field"))

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _fl(col, k: int = 4):
    """floor-based fixed-point rounding — identical in Spark & DuckDB."""
    m = 10 ** k
    return F.floor(col * m) / m


def _map_str(m) -> F.Column:
    """Deterministic 'k=v,k=v' rendering of a map, sorted by KEY — the
    entry structs are sorted before rendering, matching the oracle's
    string_agg(... ORDER BY key). Sorting the concatenated 'k=v'
    strings instead would diverge whenever one key prefixes another
    ('app' vs 'app.kubernetes.io/name': '=' > '.' flips the order)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_entries(m)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        ",",
    )


# ------------------------------------------------------------ core parse

def q_parse_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: /var/log/containers tag extraction (filter:58)."""
    df = extract_source_fields(load_table(spark, sf_dir, "transcripts"))
    return df.where(F.col("x_branch") == "containers").select(
        "conv_id",
        "turn_idx",
        F.col("x_namespace").alias("namespace"),
        F.col("x_pod_name").alias("pod_name"),
        F.col("x_container_name").alias("container_name"),
        F.col("x_docker_id").alias("docker_id"),
    )


def q_parse_pods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: /var/log/pods tag extraction (filter:57)."""
    df = extract_source_fields(load_table(spark, sf_dir, "transcripts"))
    return df.where(F.col("x_branch") == "pods").select(
        "conv_id",
        "turn_idx",
        F.col("x_namespace").alias("namespace"),
        F.col("x_pod_name").alias("pod_name"),
        F.col("x_container_name").alias("container_name"),
        F.col("x_pod_uuid").alias("pod_uuid"),
    )


# ---------------------------------------------------------- core enrich

_FLAT_COLS = [
    "conv_id",
    "turn_idx",
    "namespace_name",
    "pod_name",
    "container_name",
    "orphaned_namespace",
    "pod_id",
    "namespace_id",
    "pod_ip",
    "host",
    "master_url",
    "container_image",
    "container_image_id",
    "docker_container_id",
]


def q_enrich_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship O10-O19 enrichment, scalar columns (null == omitted)."""
    return pipeline.enrich_transcripts(spark, sf_dir).select(*_FLAT_COLS)


def q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O22 per-sink routed counts."""
    return per_sink_counts(pipeline.enrich_transcripts(spark, sf_dir))


def q_sink_role_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routed counts by (sink, role) — the per-path counter aggregate."""
    df = pipeline.enrich_transcripts(spark, sf_dir)
    return df.groupBy(
        F.coalesce(F.col("namespace_name"), F.lit(PASSTHROUGH)).alias("sink"),
        "role",
    ).agg(F.count(F.lit(1)).alias("n_rows"))


def q_orphan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14: orphaned records per original namespace (cache_strategy:58-79)."""
    df = pipeline.enrich_transcripts(spark, sf_dir)
    return (
        df.where(F.col("orphaned_namespace").isNotNull())
        .groupBy(F.col("orphaned_namespace"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def q_asof_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13: pod-miss rows — as-of accept rows carry pod_id=cache_key,
    reject rows carry none (cache_strategy.rb:46-57)."""
    df = pipeline.enrich_transcripts(spark, sf_dir)
    return df.where(
        F.col("namespace_id").isNotNull()
        & (F.col("namespace_id") != "orphaned")
        & ~F.col("i_pod_dim_hit")  # explicit pod-dim-miss flag (a dim row
        # with null pod_ip must still count as a hit)
    ).select(
        "conv_id",
        "turn_idx",
        "namespace_name",
        "pod_name",
        "pod_id",
        "namespace_id",
    )


def q_record_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 on the transcripts_carried fixture: record identity wins when
    complete, falls back to tag otherwise (filter:384-399)."""
    df = pipeline.enrich_transcripts(spark, sf_dir, table="transcripts_carried")
    return df.select(
        "conv_id",
        "turn_idx",
        "namespace_name",
        "pod_name",
        "container_name",
        "pod_id",
        "namespace_id",
        "docker_container_id",
    )


def q_pod_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16/O20: pod + namespace labels of full-hit rows as sorted k=v
    strings (exercises the map columns end-to-end)."""
    df = pipeline.enrich_transcripts(spark, sf_dir)
    return (
        df.where(F.col("i_full"))
        .select(
            "namespace_name",
            "pod_name",
            F.coalesce(_map_str(F.col("labels")), F.lit("")).alias("labels_str"),
            F.coalesce(_map_str(F.col("namespace_labels")), F.lit("")).alias("ns_labels_str"),
        )
        .distinct()
    )


def q_annotations_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17: annotation_match key-regex filtering (common.rb:30-38)."""
    t = load_table(spark, sf_dir, "transcripts")
    pods = load_table(spark, sf_dir, "pods_dim")
    ns = load_table(spark, sf_dir, "namespaces_dim")
    e = enrich(t, pods, ns, ANNOT_CFG)
    return (
        e.where(F.col("i_full"))
        .select(
            "namespace_name",
            "pod_name",
            F.coalesce(_map_str(F.col("annotations")), F.lit("")).alias("annotations_str"),
            F.coalesce(_map_str(F.col("namespace_annotations")), F.lit("")).alias(
                "ns_annotations_str"
            ),
        )
        .distinct()
    )


def q_skip_ns_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16: skip_namespace_metadata fast path (cache_strategy.rb:34-38)."""
    t = load_table(spark, sf_dir, "transcripts")
    pods = load_table(spark, sf_dir, "pods_dim")
    ns = load_table(spark, sf_dir, "namespaces_dim")
    e = enrich(t, pods, ns, PipelineConfig(skip_namespace_metadata=True))
    return e.select(
        "conv_id", "turn_idx", "namespace_name", "pod_name", "pod_id", "namespace_id", "master_url"
    )


def q_stable_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable (conv_id, turn_idx) ordering under salted repartition —
    turn_seq must be deterministic (SURVEY.md section 7.4 item 4)."""
    df = load_table(spark, sf_dir, "transcripts")
    df = salted_repartition(df, PipelineConfig())
    return stable_order(df).select("conv_id", "turn_idx", "turn_seq")


def q_container_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O19: distinct container-status correlation results on full hits."""
    df = pipeline.enrich_transcripts(spark, sf_dir)
    return (
        df.where(F.col("container_image").isNotNull())
        .select(
            "namespace_name",
            "pod_name",
            "container_name",
            "container_image",
            "container_image_id",
            "docker_container_id",
        )
        .distinct()
    )


def q_prefix_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O18: containerID runtime-prefix strip (common.rb:64)."""
    dim = load_table(spark, sf_dir, "pod_containers_dim")
    return dim.select(
        "namespace_name",
        "pod_name",
        "container_name",
        F.regexp_replace(F.col("container_id"), r"^[-_a-zA-Z0-9]+://", "").alias("container_id_stripped"),
    )


def q_per_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate breadth: per-conversation turn counts + sink cardinality."""
    df = pipeline.enrich_transcripts(spark, sf_dir)
    return df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("turn_idx").cast("int").alias("max_turn_idx"),
        F.count_distinct(F.col("namespace_name")).alias("n_sinks"),
    )


# ------------------------------------------- training-data ops (documents)

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact/head dedup via ops.dedup.exact_dedup with a head
    fingerprint (md5 of the first 8 normalized tokens) — the query
    exercises the op rather than re-implementing the window."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = F.md5(
        F.array_join(F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 8), " ")
    )
    return exact_dedup(docs, fingerprint=fp)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch dedup against a historical fingerprint set: docs
    with ``doc_id % 4 == 0`` play the already-kept corpus, the rest
    arrive as the new batch — collapsed within itself (min-id keeper)
    then anti-joined against the history. One batch shuffle: the
    keeper window and the anti-join share the fingerprint
    partitioning."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import (
        _content_fingerprint,
        incremental_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = docs.where(F.col("doc_id") % 4 == 0).select(
        _content_fingerprint("text").alias("fingerprint")
    )
    batch = docs.where(F.col("doc_id") % 4 != 0)
    return incremental_dedup(batch, seen).select("doc_id", "fingerprint")


def q_incremental_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bloom-compacted form of ``incremental_dedup``: the history
    compacts to a 2^14-bit word array built distributed and broadcast
    back; bloom-cleared batch rows (definitely new — no false
    negatives) bypass the anti-join, bloom-positive rows get the exact
    one. The oracle is the SAME NOT-IN SQL as ``incremental_dedup`` —
    the value gate proves the bloom is output-transparent."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import (
        _content_fingerprint,
        build_seen_bloom,
        incremental_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = docs.where(F.col("doc_id") % 4 == 0).select(
        _content_fingerprint("text").alias("fingerprint")
    )
    batch = docs.where(F.col("doc_id") % 4 != 0)
    bloom = build_seen_bloom(seen, n_bits=1 << 14)
    return incremental_dedup(batch, seen, bloom=bloom).select(
        "doc_id", "fingerprint"
    )


def q_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform exact-k sample (k=100) by id-hash order —
    TakeOrderedAndProject, no shuffle; md5 variant so the oracle
    reproduces the exact subset."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import sample_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_k(docs, k=100, seed=11, hash_fn="md5").select("doc_id", "lang")


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation funnel as one composed operator: quality
    gate (floored-score threshold, so the cut sits on the proven
    bit-equal 1e-4 grid) -> language gate (stopword-profile argmax) ->
    exact-dedup keeper filter. Oracle recomputes the whole funnel in
    SQL."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate(docs, min_quality=0.5, langs=("en",))


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted selection: best docs by (floored quality desc, id) until
    the running token total exceeds 10k. The engine computes the exact
    global prefix sum in two distributed phases (range partition ->
    per-partition subtotals, O(#partitions) driver map -> offset
    windows) instead of a one-partition global window; the oracle is a
    plain windowed cumulative sum over the same total order."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_budget(docs, budget=10_000)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: fraction of each corpus doc's distinct
    3-gram shingles appearing anywhere in a held-out eval set (here the
    deterministic doc_id % 97 == 0 slice). The eval shingle table is
    broadcast; the corpus side aggregates hits map-side. Runs the
    ``"raw"`` shingle variant so the oracle recomputes the probe from
    the shingle strings bit-identically; the xxhash64 production
    variant is parity-pinned in tests/test_ops.py."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    r = decontaminate(docs, ev, threshold=0.5, shingle_hash="raw")
    return r.where(F.col("n_hits") > 0).select(
        "doc_id",
        "n_shingles",
        "n_hits",
        (F.floor(F.col("overlap") * 10000) / 10000).alias("overlap4"),
        "contaminated",
    )


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document boilerplate removal: docs are re-chunked into
    deterministic 10-word pseudo-paragraphs (the synthetic corpus has
    no blank lines), then every paragraph repeated across >1 distinct
    docs is stripped and each doc reassembled in order. The planted
    duplicate/near-duplicate doc clusters in the corpus make their
    shared chunks cross-doc-frequent, so the op has real work to do."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import paragraph_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # token array STAGED through a column: an inline split() gets
    # duplicated into every per-chunk slice by Catalyst — re-splitting
    # the text per chunk, O(tokens x chunks) per doc (round 7; the
    # shingles_from_tokens staging contract)
    tk = F.col("_tk")
    nch = F.ceil(F.size(tk) / F.lit(10.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(1), nch),
        lambda i: F.concat_ws(" ", F.slice(tk, (i - F.lit(1)) * 10 + 1, 10)),
    )
    structured = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("_tk")
    ).select("doc_id", F.array_join(paras, "\n\n").alias("text"))
    return paragraph_dedup(structured, max_df=1)


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: per doc, the fraction of word
    n-grams (n=1,2,3) taken by the single most frequent n-gram — the
    standard degenerate-text filter. Output floored to the 1e-4 grid
    (each frac is one int/int division, exact on both engines; the
    floor keeps the gate on the proven grid)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import repetition_signals

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = repetition_signals(docs)
    return r.select(
        "doc_id",
        *[
            (F.floor(F.col(f"top{n}_frac") * 10000) / 10000).alias(f"top{n}_frac4")
            for n in (1, 2, 3)
        ],
    )


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: deterministic synthetic PII (email, ipv4, card
    number, phone) is planted on every doc_id % 7 == 0, then the
    sequential count+replace chain runs; the oracle replays the
    identical pattern sequence (Java-regex and RE2 compatible by
    construction) on the identically planted text."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".99 card 4111111111111111 tel +1 555-200-3000"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(planted).select(
        "doc_id", "n_email", "n_ipv4", "n_card", "n_phone", "redacted_text"
    )


def q_full_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE pre-training data funnel as one composed job:
    quality gate -> language gate -> exact-dedup keeper (curate) ∩
    repetition gate (top-2-gram fraction <= 0.15 on the floored grid) ∩
    decontamination gate (eval-overlap < 0.5) -> token-budget selection
    over the survivors. Every stage is an existing operator; the gates
    run as semi-joins on doc_id, so the expensive budget phase sees
    only surviving docs. The oracle recomputes the whole funnel in SQL."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import decontaminate
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import (
        curate,
        repetition_signals,
        token_budget,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # materialize ONE doc-grain base for the whole funnel: the three
    # gate branches and the budget phase are separate DataFrame
    # branches, and Spark re-executes the scan (and everything built on
    # it) per branch — 5 passes over the corpus text without this. The
    # id-repartition also pre-pays the partitioning repetition_signals
    # and the budget's window want. At 100 TB this is the standard
    # materialize-vs-rescan trade: one corpus-sized local materialization
    # buys four eliminated re-scans of scored text.
    p = spark.sparkContext.defaultParallelism
    base = docs.repartition(
        max(p, docs.rdd.getNumPartitions()), "doc_id"
    ).localCheckpoint()
    kept = curate(base, min_quality=0.5, langs=("en",)).select("doc_id")
    rep_ok = (
        repetition_signals(base)
        .where((F.floor(F.col("top2_frac") * 10000) / 10000) <= 0.15)
        .select("doc_id")
    )
    ev = base.where(F.col("doc_id") % 97 == 0)
    dec_ok = (
        decontaminate(base, ev, threshold=0.5, shingle_hash="raw")
        .where(~F.col("contaminated"))
        .select("doc_id")
    )
    survivors = (
        base.join(kept, "doc_id", "semi")
        .join(rep_ok, "doc_id", "semi")
        .join(dec_ok, "doc_id", "semi")
    )
    return token_budget(survivors, budget=8_000)


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (0.8/0.1/0.1) keyed on
    the id hash — reproducible on any cluster size or partitioning,
    unlike df.sample(). md5 variant so the oracle recomputes the exact
    assignment; the xxhash64 production variant is distribution-tested
    in pytest."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    return hash_split(docs, w, hash_fn="md5").select("doc_id", "split")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (en 0.5, de 0.25, rest
    0.1) — the corpus-mixing primitive; kept set is a pure function of
    (id, seed)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import (
        stratified_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keep = stratified_sample(
        docs, {"en": 0.5, "de": 0.25}, strata_col="lang", default=0.1,
        seed=7, hash_fn="md5",
    )
    return keep.select("doc_id", "lang")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing layout: global token-stream offset and
    starting training-sequence id (seq_len 512) per doc, via the
    distributed pinned prefix sum; the oracle is a plain windowed
    cumulative sum over the same order."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, seq_len=512)


def q_pack_shuffled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing over the deterministic SHUFFLED document order (id
    unit-hash sort key, md5 variant so the oracle reproduces the exact
    permutation) — same distributed prefix sum, different range-
    partition key."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, seq_len=512, shuffle_seed=5, hash_fn="md5")


def q_seed_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-style quality scoring: max cosine of every embedding
    to the vec_id % 101 == 0 seed slice, seeds compiled as expression
    literals (zero joins/shuffles). Floored to the 1e-4 grid; the
    oracle recomputes the same double fold over the seed table."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.similarity import (
        seed_similarity_scores,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seeds = emb.where(F.col("vec_id") % 101 == 0)
    r = seed_similarity_scores(emb, seeds)
    return r.select(
        "vec_id", (F.floor(F.col("seed_sim") * 10000) / 10000).alias("seed_sim4")
    )


def q_paragraph_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: docs re-chunked into 10-word
    pseudo-paragraphs, every chunk appearing anywhere in the
    doc_id % 97 == 0 eval slice is scrubbed, docs reassembled in order
    (whole-doc flagging stays in `decontaminate`; this is the surgical
    variant)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import paragraph_scrub

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # staged token array — same O(tokens x chunks) guard as
    # q_paragraph_dedup (round 7)
    tk = F.col("_tk")
    nch = F.ceil(F.size(tk) / F.lit(10.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(1), nch),
        lambda i: F.concat_ws(" ", F.slice(tk, (i - F.lit(1)) * 10 + 1, 10)),
    )
    structured = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("_tk")
    ).select("doc_id", F.array_join(paras, "\n\n").alias("text"))
    ev = structured.where(F.col("doc_id") % 97 == 0)
    return paragraph_scrub(structured, ev)


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2021 ExactSubstr): every
    8-token span occurring >= 2 times corpus-wide is excised from every
    doc that carries it and docs are rebuilt from the surviving tokens.
    The planted duplicate/near-duplicate clusters share long verbatim
    runs, so ~10% of the corpus loses spans."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import substring_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return substring_dedup(docs, k=8)


def q_substring_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr in the paper's all-but-one form: the (doc_id, pos)-
    smallest occurrence of each duplicated 8-token window is not
    duplicate evidence, so one copy of every duplicated run survives.
    The oracle recomputes the keeper exclusion from the raw window
    strings with a row_number over (doc_id, pos)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import substring_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return substring_dedup(docs, k=8, policy="keep_first")


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring: vocabulary truncated to the top 32
    tokens (cnt desc, token asc tiebreak — deterministic on both
    engines), OOV floored at alpha/total, per-doc mean NLL on the 1e-4
    grid."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import lm_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lm_score(docs, top_k=32)


def q_lm_score2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality scoring: top-32 unigram AND
    bigram vocabularies (count desc, token asc ties), true conditional
    p(cur|prev) from the full unigram denominator, lam=0.8
    interpolation with the unigram OOV floor, per-doc mean NLL on the
    1e-4 grid. Docs with <2 tokens are absent by contract."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import lm_score2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lm_score2(docs, top_k=32)


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail buckets over the bigram-LM score:
    tertile thresholds from the deterministic 999-doc md5-hash-order
    sample (a pure function of ids and seed), applied as literals —
    the oracle re-derives the identical sample and order statistics."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import (
        perplexity_buckets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return perplexity_buckets(docs, top_k=32, sample_n=999, seed=17, hash_fn="md5")


def q_clean_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line cleaning: docs re-chunked into 8-word pseudo-lines
    with a terminal '.' on lines whose md5 first hex digit < '8' (a
    deterministic coin both engines flip identically), then the
    min-words + terminal-punctuation line gates and the >= 3 surviving
    lines page gate."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import clean_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # staged token array (round 7): chunk(i) is referenced TWICE per
    # line (text + md5 coin), so an inline split() would re-split the
    # text 2x per chunk — O(tokens x chunks) per doc
    tk = F.col("_tk")
    nch = F.ceil(F.size(tk) / F.lit(8.0)).cast("int")
    chunk = lambda i: F.concat_ws(" ", F.slice(tk, (i - F.lit(1)) * 8 + 1, 8))  # noqa: E731
    lines = F.transform(
        F.sequence(F.lit(1), nch),
        lambda i: F.concat(
            chunk(i),
            F.when(F.substring(F.md5(chunk(i)), 1, 1) < "8", F.lit(".")).otherwise(F.lit("")),
        ),
    )
    structured = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_tk")
    ).select("doc_id", F.array_join(lines, "\n").alias("text"))
    # page_ban_substrings=() too: the oracle's keep gate is n_kept >= 3
    # only, so the engine's default page markers ('lorem ipsum', '{')
    # must be off or a corpus doc containing one would flip keep
    return clean_lines(structured, ban_substrings=(), page_ban_substrings=())


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted domain mixing: downsample to a 60/25/15 en/de/fr
    token mixture (zh/es dropped), the binding domain kept whole, keeps
    decided by the md5 id hash the oracle recomputes bit-identically."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import domain_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    d = docs.select("doc_id", "lang", toks.alias("_w"))
    return domain_mix(
        d, {"en": 0.6, "de": 0.25, "fr": 0.15}, domain_col="lang",
        weight_col="_w", seed=13, hash_fn="md5",
    ).select("doc_id", "lang")


def q_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-balanced sampling: a 15,000-token budget spread
    as uniformly as the 0.9-epoch caps allow — low-mass languages keep
    everything up to their cap, the remainder splits evenly. The
    oracle recomputes the closed-form waterfill (sorted caps, prefix
    sums, prefix-monotone saturation test) with the identical IEEE op
    order, then replays the same md5 hash gate."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import unimax_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    d = docs.select("doc_id", "lang", toks.alias("_w"))
    return unimax_mix(
        d, budget=15000.0, max_epochs=0.9, lang_col="lang",
        weight_col="_w", seed=29, hash_fn="md5",
    ).select("doc_id", "lang")


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: k-means clusters (n_iter=0
    — the seed-centroid quantizer, so the DuckDB oracle replays
    assignment exactly with no float-averaging drift; the Lloyd-refined
    production default is pinned by unit tests), then within-cluster
    cosine >= 0.2 drops the higher id. Emits every item's cluster and
    keep flag."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    marked, _ = semantic_dedup(emb, dim=64, n_clusters=8, threshold=0.2, n_iter=0)
    return marked.select("vec_id", "cluster", "keep")


def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes coreset selection over the embeddings table:
    seed-centroid quantizer (n_iter=0, exactly SQL-replayable), 8
    clusters, keep the 16 most PERIPHERAL items per cluster
    (mode='outlier' — the hard-example rule). Emits every item's
    cluster, floored distance, rank, and keep flag."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.similarity import cluster_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cluster_sample(emb, dim=64, n_clusters=8, per_cluster=16,
                          n_iter=0, mode="outlier")


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 characteristic terms by TF-IDF (floored-grid
    scores, term-asc tiebreak)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import tfidf_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_terms(docs, top_terms=3)


def q_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 bigram frequency table (occurrences + doc
    frequency, gram-asc tiebreak)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import ngram_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_stats(docs, n=2, top_k=50)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: target = the doc_id % 13 == 0 slice
    (a deterministic stand-in for the high-quality seed corpus), raw =
    every doc; hashed uni+bigram features in 256 buckets, Laplace-1
    smoothing, floored-grid log weights."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import dsir_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_weights(docs, docs.where(F.col("doc_id") % 13 == 0),
                        n_buckets=256)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel top-k resampling: 200 docs drawn without replacement
    with probability proportional to importance weight, via the
    deterministic md5 inverse-CDF Gumbel key."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import dsir_select

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_select(docs, docs.where(F.col("doc_id") % 13 == 0),
                       k=200, n_buckets=256)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + char stats."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        n.cast("bigint").alias("n_tokens"),
        _fl(F.length(F.regexp_replace(F.col("text"), r"\s+", "")) / n, 4).alias("avg_token_len"),
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: punctuation ratio, stopword ratio, length score."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    # decomposed positive-class counts: Java evaluates negated classes
    # ~10x slower AND core-scaling collapses (see ops/text.quality_score)
    punct = (
        F.length(F.col("text"))
        - F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]"))
        - F.regexp_count(F.col("text"), F.lit(r"\s"))
    )
    return docs.select(
        "doc_id",
        _fl(punct / F.length("text"), 4).alias("punct_ratio"),
        _fl(stop / n, 4).alias("stopword_ratio"),
        (F.length("text") >= 100).alias("len_ok"),
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English stopword-hit count >= 1 -> 'en'
    (deterministic n-gram-free heuristic; real systems plug a model UDF)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of")))
    return docs.select(
        "doc_id",
        "lang",
        F.when(hits >= 1, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the whitespace-normalized,
    lowercased text + 5-token shingle count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = F.split(norm, " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("doc_fp"),
        F.greatest(F.size(toks) - F.lit(4), F.lit(0)).cast("bigint").alias("n_shingles5"),
    )


NGRAM_JACCARD_DF_CAP = 256


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram-shingle Jaccard near-dup pairs (threshold 0.55). The
    shuffle key is the shingle, so the self-join distributes; at 100 TB
    you'd LSH first (minhash) and only Jaccard-verify candidates."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # String-free shingle keys (round 7, the minhash_signatures fast
    # path): hash the word TRIPLE via xxhash64 argument chaining instead
    # of building a 3-word string per shingle and hashing that — no
    # shingle-string allocation, same int64 shuffle width. The token
    # array is STAGED through a column (the raw split() expression would
    # be inlined into every element_at by Catalyst — re-splitting the
    # text per element, the O(tokens^2) hazard shingles_from_tokens
    # documents). Distinct triples == distinct shingle strings (tokens
    # contain no whitespace), so intersection/size counts — and the
    # oracle's raw-string Jaccard — are unchanged barring a 64-bit hash
    # collision (p ~ n^2/2^65, the already-documented contract).
    # NB: Spark sequence(1, 0) is DESCENDING, not empty — guard short docs
    tk = F.col("_tk")
    hashes = F.when(
        F.size(tk) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 2),
                lambda i: F.xxhash64(
                    F.element_at(tk, i), F.element_at(tk, i + 1), F.element_at(tk, i + 2)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import _spread

    toks = _spread(docs, "doc_id").select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("_tk")
    ).select("doc_id", F.explode(hashes).alias("tok"))
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    # one shuffle keyed by shingle + inline pair expansion, with a
    # stop-shingle document-frequency cap (256 — far above the measured
    # max df of 7 at sf0.01 / 25 at sf0.1, so test-scale results are
    # unchanged; at 100 TB it bounds any task's expansion to 256^2/2
    # pairs and the drop count is observable, not silent).
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import grouped_pair_expansion

    pairs, _obs = grouped_pair_expansion(toks, df_cap=NGRAM_JACCARD_DF_CAP)
    inter = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn("jaccard", _fl(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
    )
    return jac.where(F.col("jaccard") >= 0.55).select("id_a", "id_b", "jaccard")


def q_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup KEEPER assignment: n-gram Jaccard pairs
    (threshold 0.55) -> connected components -> keeper = component min
    (iterative min-label propagation, ops/dedup.propagate_min_keeper).
    Value-checked against a DuckDB recursive-CTE transitive closure —
    the set-based ground truth for the iterative Spark algorithm."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import (
        propagate_min_keeper,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = q_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    keep = propagate_min_keeper(pairs, docs.select("doc_id"))
    return keep.select(
        "doc_id", "keep_id", (F.col("doc_id") != F.col("keep_id")).alias("is_dup")
    )


def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full web-scale dedup composition as ONE driver-gated unit:
    exact_dedup (normalized-md5, collapses the mega-clusters that make
    LSH bucket caps sound) -> capped MinHash-LSH + exact-Jaccard verify
    over the exact keepers only -> union of exact and near-dup edges ->
    connected-component keeper (pointer-jumping min-label). Oracle:
    DuckDB recomputes the same graph (exact groups + all-pairs Jaccard
    >= 0.5 among keepers) and closes it with a recursive CTE."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import dedup_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_pipeline(docs).select("doc_id", "keep_id", "is_dup")


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors (vec_id < 5) over the
    embeddings table — the exact baseline an IVF/LSH path approximates.
    Dot products run JVM-side via zip_with/aggregate (no Python)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x * x))
    base = emb.select("vec_id", vec_d.alias("v"), norm.alias("nrm"))
    q = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = base.where(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = q.crossJoin(cand).select(
        "query_id", "cand_id", _fl(dot / (F.col("qn") * F.col("cn")), 4).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "cand_id", "sim", "rank")
    )


def _rerank_rounded(out: DataFrame, k: int = 10) -> DataFrame:
    """Driver-contract shaping for ANN outputs: round sims to the
    oracle's fixed-point grid and re-rank within each query on
    (rounded sim desc, cand_id) — the oracle's exact tie-break — then
    keep rank <= k. Callers OVERFETCH from the engine (2k): the engine
    ranks on unrounded sims, so candidates in the same 1e-4 floor bin
    straddling the engine's rank-k boundary could otherwise be kept or
    dropped differently than the oracle's rounded ordering; with 2k
    fetched, a divergence needs >k candidates inside one boundary bin.
    The input is O(k) rows/query, so this window is cheap."""
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        out.select("query_id", "cand_id", _fl(F.col("sim"), 4).alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", "rank")
    )


def q_ann_topk_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 via the blocked-GEMM mapInPandas path — the
    high-throughput exact engine (one numpy GEMM per Arrow batch,
    broadcast query matrix). Must be value-identical to q_ann_topk /
    the same DuckDB oracle."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.similarity import (
        brute_force_topk_gemm,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    c = emb.where("vec_id >= 5")
    out = brute_force_topk_gemm(q, c, k=20)  # overfetch 2k: see _rerank_rounded
    return _rerank_rounded(out, k=10)


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe = n_centroids: probing every inverted list
    makes the clustered path EXACT, so the brute-force oracle checks the
    whole coarse-quantize -> probe -> re-rank machinery end-to-end. The
    scale configuration (nprobe << n_centroids) trades that recall for
    a 1/n_centroids candidate fan-in; recall vs exact is tested in
    tests/test_ops.py."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 5")
    c = emb.where("vec_id >= 5")
    out = ivf_topk(q, c, dim=64, k=20, n_centroids=16, nprobe=16)  # overfetch 2k
    return _rerank_rounded(out, k=10)


# ------------------------------- ops queries — ALL oracle-gated. The
# LSH/minhash/simhash driver queries run md5 hash variants whose base
# hash DuckDB recomputes bit-identically from the same text (the
# xxhash64 production defaults share every downstream line and stay
# pinned by planted-duplicate and determinism tests in tests/test_ops);
# lsh_neardup's plane/band machinery is rebuilt in SQL.

def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs with exact Jaccard verification,
    VALUE-checked: runs the md5 shingle-hash variant so the oracle
    recomputes the full 64-permutation signatures from raw text,
    replicates the 16x4 banding as a (band, 4-value) join, and verifies
    exact Jaccard on those candidates — no LSH-recall assumption; a pair
    the engine's banding+cap machinery loses or invents fails the gate.
    The xxhash64 production default shares all downstream code and is
    exercised by dedup_pipeline and the planted-duplicate tests."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_dedup(docs, threshold=0.5, shingle_hash="md5")
    return pairs.select("id_a", "id_b", _fl(F.col("jaccard"), 4).alias("jaccard"))


def q_minhash_jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates -> exact-Jaccard verification, VALUE-checked:
    the oracle independently computes the exact all-pairs Jaccard set in
    DuckDB, so this passes only if (a) the verify stage's Jaccard values
    are exact AND (b) LSH recall is 100% at this scale (planted near-dups
    sit far above the 0.5 threshold; measured recall 1.0 at sf0.01 —
    at production scale LSH recall < 1 is the accepted trade).

    Delegates to q_minhash_pairs: the two driver registrations are BY
    DESIGN the same computation (one rows-only, one value-gated) — a
    separate copy could silently desynchronize."""
    return q_minhash_pairs(spark, sf_dir)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, VALUE-checked: runs the md5
    token-hash variant, which DuckDB recomputes bit-identically from
    the same text (tokenize -> per-token md5 halves -> 64 sign sums ->
    reassembled int64). The xxhash64 production default shares every
    line of machinery except the leaf hash expression and stays pinned
    by the determinism/pigeonhole tests in tests/test_ops.py."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dd.simhash64(docs, token_hash="md5")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) via 2-chunk combo banding
    and the capped grouped expansion, VALUE-checked: the oracle
    brute-forces all-pairs bit_count(xor) <= 3 over DuckDB-recomputed
    simhash values (md5 token-hash variant), independent of the
    banding — pigeonhole banding has recall 1 for hamming <= 3 by
    construction and no sf0.01 bucket exceeds the cap, so engine and
    brute force must agree EXACTLY; a silently dropped pair fails the
    gate."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dd.simhash_pairs(dd.simhash64(docs, token_hash="md5"))


def q_neardup_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (threshold 0.2 on synthetic
    clustered embeddings) — the oracle-checked baseline for the LSH path."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.similarity import (
        _as_double,
        _dot,
        _norm,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = emb.select("vec_id", _as_double(F.col("embedding")).alias("v")).withColumn(
        "nrm", _norm(F.col("v"))
    )
    a = v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    sim = _fl(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4)
    return pairs.select("id_a", "id_b", sim.alias("sim")).where(F.col("sim") >= 0.2)


def q_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup (subset of q_neardup_brute),
    VALUE-checked: the oracle rebuilds the 16 sign bits from the same
    6-decimal plane literals, buckets on (band, 2-bit value) — the
    engine's xxhash64 key folding is shuffle-width optimization only —
    and verifies exact cosine; recall vs the exact baseline is also
    tested in tests/test_ops.py."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.similarity import embedding_neardup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # n_bands=8 -> 2-bit band keys, chosen for recall at the loose 0.2
    # threshold; coarse keys make big buckets SIGNAL, so no bucket_cap
    # (see embedding_neardup's docstring for when a cap is sound)
    pairs, _ = embedding_neardup(emb, dim=64, threshold=0.2, n_planes=16, n_bands=8)
    return pairs.select("id_a", "id_b", _fl(F.col("sim"), 4).alias("sim"))


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from the driver's documents
    table: payload = UTF-8 bytes of the text (a real opaque binary
    column), kind cycles image/audio/video by doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(kinds, (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        ((F.col("doc_id") % 10 + 1) * 1000).cast("int").alias("duration_ms"),
    )


def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash per media item: the deterministic 64-cell grid
    decoder (8x8-thumbnail stand-in, exact integer basis points) feeds
    the JVM-side aHash packing — bit i set when cell i is strictly
    above the floored integer grid mean, bit 63 via the min-long
    two's-complement term. The oracle recomputes every cell, the mean,
    and the packed int64 from the same bytes in integer SQL."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import _spread
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.multimodal import (
        bp_grid_decoder,
        perceptual_hash,
    )

    media = _spread(
        _media_from_documents(spark, sf_dir).select("media_id", "kind", "payload"),
        "media_id",
    )
    return perceptual_hash(media, decoder=bp_grid_decoder)


def q_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-duplicate pairs: aHash each payload, band the
    64-bit hashes with the text stack's 2-chunk-combo machinery
    (n_chunks=8 >= max_hamming+2, uncapped), verify exact hamming <= 6
    inline. Recall is exactly 1 by pigeonhole, so the brute-force
    all-pairs oracle is an equality check, not a bound."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import _spread
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.multimodal import (
        bp_grid_decoder,
        media_neardup,
    )

    media = _spread(
        _media_from_documents(spark, sf_dir).select("media_id", "kind", "payload"),
        "media_id",
    )
    return media_neardup(
        media, decoder=bp_grid_decoder, max_hamming=6, n_chunks=8, bucket_cap=None
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction, driver-gated end-to-end: binary
    payload column -> Arrow-batched mapInPandas (ops/multimodal.
    extract_features) with the deterministic basis-point decoder ->
    narrow feature rows (payload dropped in the UDF). The oracle
    recomputes n_bytes/md5/chunk-mean basis points from the same bytes
    in pure integer SQL, so the whole mapInPandas plumbing — schema,
    batch shape, null handling — is value-checked, with only the
    physical decode library (PIL/ffmpeg) stubbed."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.multimodal import (
        bp_feature_decoder,
        extract_features,
    )

    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import _spread

    # decode is ~100x work per input byte: spread small scans across
    # cores (no-op at scale, where the table carries thousands of splits)
    media = _spread(
        _media_from_documents(spark, sf_dir).select("media_id", "kind", "payload"),
        "media_id",
    )
    feats = extract_features(media, decoder=bp_feature_decoder)
    return feats.select(
        "media_id", "kind", "n_bytes", "payload_hash",
        *[F.col("feature")[i].cast("bigint").alias(f"f{i}") for i in range(8)],
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (ops/multimodal.frame_sample_plan):
    expands (media_id, duration_ms) into frame timestamps JVM-side
    without touching the payload column — the pruning-friendly half of
    the video pipeline, oracle-checked row-for-row."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.multimodal import (
        frame_sample_plan,
    )

    media = _media_from_documents(spark, sf_dir).select("media_id", "kind", "duration_ms")
    plan = frame_sample_plan(media, every_ms=1000)
    return plan.select("media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"))


def q_quality_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score + component ratios (oracle-gated via
    _quality_full_oracle; fixed-point floors on the float ratios)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quality_score(docs)
    return out.select(
        "doc_id",
        _fl(F.col("quality_score"), 4).alias("quality_score"),
        _fl(F.col("distinct_token_ratio"), 4).alias("distinct_token_ratio"),
    )


def q_langid_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-language stopword-profile language ID (argmax over profiles)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import langid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return langid(docs).select("doc_id", "lang", "lang_pred")


def q_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token counts (regexp pre-tokenizer)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import token_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_counts(docs).select("doc_id", "n_tokens_ws", "n_tokens_bpe", "n_chars")


# ------------------------------------------------ log/event stream queries
# (the reference is a log pipeline; the driver's events table carries a
# JSON props column — grok/JSON parse + windowed aggregates are the
# telemetry-side capabilities, SURVEY.md O22/O23)

def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction (from_json with explicit schema — the
    structured-log analogue of the tag parse)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        "event_type",
        parsed["k"].alias("props_k"),
    )


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregates per event_type (1 hour) —
    the stats-interval dump as a batch query."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = F.window("ts", "1 hour")
    return ev.groupBy(w.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        _fl(F.sum("value"), 4).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization per user: gap > 30 min starts a new session
    (lag + cumulative sum — the classic composition)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; microsecond-precision epoch so sub-second gaps
    # round the same way as the DuckDB oracle's epoch_us() (a plain
    # cast-to-long truncates micros and mis-assigns sessions at the
    # 30-minute boundary).  Gap difference cancels the session-tz offset.
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    df = ev.withColumn("new_sess", new_sess)
    sess_id = F.sum("new_sess").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    return (
        df.withColumn("session_id", sess_id)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ------------------------------------------- large-join scaling probes
# The reference implements no general join/aggregate surface
# (SURVEY.md:149-157) — these run over the driver's TPC-H relations as
# NON-broadcast-flattered scaling probes: a scan-bound partial-agg job
# and a 3-table join whose big sides exceed any broadcast threshold at
# sf>=1, so the physical plan is a genuine shuffle (sort-merge) join.
# All money math is per-row-double -> DECIMAL before SUM: decimal sums
# are exact and associative, so results are bit-stable regardless of
# partial-aggregation order on either engine. The EMITTED columns are
# exact scaled BIGINTs (cents / basis points), never DECIMAL: the
# driver's value hasher canonicalizes Arrow scalars and decimal128
# does not survive it (same class as DuckDB's HUGEINT in
# events_sessionize) — driver-hashed queries emit only
# BIGINT/DOUBLE/VARCHAR/TIMESTAMP. The decimal sum is integral at the
# chosen scale, so x100/x10^4 then CAST AS BIGINT is lossless.

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 flavor): scan-bound groupBy with
    map-side partial aggregation; the filter and the 6-column projection
    must reach the parquet scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    # raw-column timestamp compare (date <= 1998-09-02 == ts < 09-03):
    # a cast on the column would block parquet predicate pushdown
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-09-03").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("bigint").alias("sum_qty_c100"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("bigint").alias("sum_base_price_c100"),
            (F.sum(disc_price) * 10000).cast("bigint").alias("sum_disc_price_bp"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority revenue (TPC-H Q3 flavor): customer |x| orders
    |x| lineitem. The customer side broadcasts (small dim); orders |x|
    lineitem is large-large — the shuffle-join scaling probe."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    # raw-column compares keep both date predicates pushdown-eligible:
    # orderdate < 1998-06-01 == ts < midnight; shipdate > 1998-06-01
    # (as a date) == ts >= 1998-06-02 midnight
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp_ntz"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.lit("1998-06-02").cast("timestamp_ntz"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg((F.sum(revenue) * 10000).cast("bigint").alias("revenue_bp"))
    )


# --------------------------------------------------------------- grok

def q_grok_apache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grok parse of apache-combined access logs (one regex pass,
    group-indexed extraction; malformed lines -> nulls + matched=false)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.grok import APACHE_COMBINED, grok_extract

    logs = load_table(spark, sf_dir, "logs")
    out = grok_extract(logs, "line", APACHE_COMBINED)
    return out.select(
        "log_id", "clientip", "verb", "request", "response", "bytes", "grok_matched"
    )


def q_grok_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route-style aggregate over the grok parse: requests per status."""
    from fluent_plugin_kubernetes_metadata_filter_spark.grok import APACHE_COMBINED, grok_extract

    logs = load_table(spark, sf_dir, "logs")
    out = grok_extract(logs, "line", APACHE_COMBINED)
    return out.groupBy(
        F.coalesce(F.col("response"), F.lit("__unparsed__")).alias("status")
    ).agg(F.count(F.lit(1)).alias("n_requests"))
