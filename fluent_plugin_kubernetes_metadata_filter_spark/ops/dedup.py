"""Deduplication operators for a training-data pipeline.

Four tiers, all deterministic and shuffle-conscious:

- exact:        hash-groupBy on a content fingerprint (cheapest)
- minhash_lsh:  shingle -> 64-perm MinHash -> banded LSH buckets ->
                candidate pairs -> exact-Jaccard verification
- simhash:      64-bit sign-random-projection over token hashes; near-dup
                when hamming distance <= k (banded on 16-bit chunks)
- embedding:    random-hyperplane LSH over an embedding column with exact
                cosine verification (see similarity.py for the ANN path)

Scale notes: every stage is expression-only (whole-stage codegen; no
Python in the hot path). The LSH self-joins shuffle on (band, signature)
— band signatures distribute uniformly by construction, so there is no
hot key; candidate verification touches only the candidate pairs, never
the full cross product. At 100 TB you tune n_bands/rows_per_band for the
target Jaccard threshold s ~ (1/b)^(1/r) and the verify stage stays
proportional to the true-duplicate density.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, Window

# MinHash parameters: 64 permutations = 16 bands x 4 rows -> s-curve
# threshold ~ (1/16)^(1/4) ~ 0.5
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
# 2^31-1 (Mersenne prime). Shingle hashes and permutation coefficients
# stay below 2^31 so a*h+b fits in int64 under ANSI arithmetic.
_MERSENNE = (1 << 31) - 1


def _perm_params(n: int = N_PERM, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n, dtype=np.int64)
    return a.tolist(), b.tolist()


def tokenize(text_col) -> F.Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def shingles(text_col, k: int = 3) -> F.Column:
    """Distinct k-gram word shingles; JVM-side (no UDF)."""
    tk = tokenize(text_col)
    return F.when(
        F.size(tk) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + j) for j in range(k)]
                ),
            )
        ),
    ).otherwise(F.array(F.array_join(tk, " ")))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the normalized content hash; keeper = min id."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    d = df.select(id_col, F.md5(norm).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return d.select(
        id_col,
        "fingerprint",
        F.min(id_col).over(w).alias("keep_id"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Text-expansion ops (shingling, hashing, n_perm aggregates) do
    ~100x work per input BYTE, so a scan split by file size
    under-parallelizes small inputs — one sub-2MB parquet file is a
    single task doing all the shingling. Repartition by the doc key up
    to default parallelism when the scan has fewer splits; a no-op at
    scale, where the input already carries thousands of splits."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, key)
    return df


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n_perm: int = N_PERM, seed: int = 42) -> DataFrame:
    """(id, sig: array<bigint>[n_perm]) via explode + single groupBy with
    n_perm min-aggregates (one shuffle, map-side combined)."""
    a, b = _perm_params(n_perm, seed)
    df = _spread(df, id_col)
    sh = df.select(F.col(id_col), F.explode(shingles(F.col(text_col))).alias("sh"))
    # 31-bit shingle hash (xxhash64 folded) keeps a*h+b inside int64
    h = F.pmod(F.xxhash64(F.col("sh")), F.lit(_MERSENNE))
    aggs = [
        F.min(F.pmod(h * F.lit(int(a[i])) + F.lit(int(b[i])), F.lit(_MERSENNE))).alias(f"m{i}")
        for i in range(n_perm)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(id_col, F.array(*[f"m{i}" for i in range(n_perm)]).alias("sig"))


def minhash_lsh_candidates(sigs: DataFrame, id_col: str = "doc_id",
                           n_bands: int = N_BANDS) -> DataFrame:
    """Banded LSH: docs sharing any band signature become a candidate
    pair. Shuffle key = (band, band_hash) — uniform by construction."""
    r = F.size(F.col("sig")) / n_bands
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda bidx: F.struct(
                    bidx.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"),
                                    (bidx * r + 1).cast("int"),
                                    r.cast("int"),
                                ),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select(id_col, "b.band", "b.bh")
    l = bands.alias("l")
    rt = bands.alias("r")
    return (
        l.join(
            rt,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def grouped_pair_expansion(
    toks: DataFrame,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    df_cap: int | None = 256,
) -> tuple[DataFrame, Observation | None]:
    """Ordered candidate pairs from a (id, token) table in ONE shuffle:
    group by token, sorted doc-list per token, pairs expanded inline —
    ~2x faster than the self-join formulation (no second shuffle of the
    token table).

    A token shared by k docs expands k^2/2 pairs in one task, so tokens
    with document frequency above ``df_cap`` (stop-shingles — they carry
    no discriminative similarity) are DROPPED before expansion; at 100 TB
    one hot shingle would otherwise OOM a single task. The drop is not
    silent: the returned Observation reports ``dropped_tokens`` and
    ``max_df`` once an action consumes the pairs. ``df_cap=None``
    disables the cap (test-scale only).
    """
    groups = (
        toks.groupBy(tok_col)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
        .where(F.size("ds") > 1)
    )
    obs: Observation | None = None
    if df_cap is not None:
        obs = Observation()
        groups = groups.observe(
            obs,
            F.count(F.when(F.size("ds") > df_cap, 1)).alias("dropped_tokens"),
            F.max(F.size("ds")).alias("max_df"),
        ).where(F.size("ds") <= df_cap)
    pairs = groups.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ds"),
                    lambda a, i: F.transform(
                        F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs, obs


def jaccard_verify(df: DataFrame, candidates: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", threshold: float = 0.5) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (never all-pairs)."""
    sh = _spread(df, id_col).select(
        F.col(id_col), F.explode(shingles(F.col(text_col))).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh"))
    inter = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.5) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline -> verified pairs."""
    sigs = minhash_signatures(df, text_col, id_col)
    cand = minhash_lsh_candidates(sigs, id_col)
    return jaccard_verify(df, cand, text_col, id_col, threshold)


# ----------------------------------------------------------- SimHash

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over token hashes, expression-only: explode tokens,
    per-bit +-1 sums in ONE groupBy, reassemble the sign bits."""
    toks = _spread(df, id_col).select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("t")
    )
    h = F.xxhash64(F.col("t"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    per_bit = toks.groupBy(id_col).agg(*aggs)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return per_bit.select(id_col, sim.alias("simhash"))


def simhash_pairs(hashes: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by hamming distance <= k, banded on 4x16-bit chunks
    (pigeonhole: any pair within hamming 3 shares at least one chunk)."""
    chunks = hashes.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.ci", "c.cv")
    l = chunks.alias("l")
    r = chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.ci") == F.col("r.ci"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.withColumn("hamming", hamming).where(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# ------------------------------------------------- connected keepers

def propagate_min_keeper(pairs: DataFrame, ids: DataFrame, id_col: str = "doc_id",
                         max_iter: int = 10) -> DataFrame:
    """Connected-component keeper assignment by iterative min-label
    propagation over the dup-pair graph (converges in O(diameter) rounds;
    near-dup clusters are shallow in practice). Returns (id, keep_id).

    Each round materializes the new labels via ``localCheckpoint`` so the
    plan stays one-join deep regardless of round count (unmaterialized
    lineage would grow a join per round and every convergence probe would
    re-execute the whole chain); the probe itself is an ``isEmpty`` on
    the changed-rows diff, not a full count.
    """
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    edges = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.localCheckpoint(eager=False)
    labels = ids.select(F.col(id_col).alias("u"), F.col(id_col).alias("lbl"))
    labels = labels.localCheckpoint(eager=False)
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = labels.join(nbr_min, "u", "left").select(
            "u", F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias("lbl")
        )
        new_labels = new_labels.localCheckpoint()  # truncate lineage per round
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            break
    return labels.select(F.col("u").alias(id_col), F.col("lbl").alias("keep_id"))
