"""Deterministic corpus sampling and splitting.

Training-data assembly needs REPRODUCIBLE subsets: the same doc must
land in the same split/sample on every run, on any cluster size, under
any partitioning — which rules out `df.sample()` (partition-seeded,
changes with the physical plan). Everything here keys off a pure hash
of the document id, so assignment is a property of the DATA, not of
the execution:

- `hash_split`: train/val/test (any named weights) assignment.
- `stratified_sample`: per-stratum keep fractions (e.g. downsample
  by language or source), unlisted strata get a default.

All expression-only (whole-stage codegen, zero shuffle, zero Python) —
at 100 TB these ride the scan for free. ``hash_fn``: ``"xxhash64"``
(default, fastest) or ``"md5"`` (first 8 md5 hex chars — bit-identical
across Spark and DuckDB, the round-4-proven gate variant, so the
driver's correctness oracle recomputes assignments exactly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Unit-interval grid: hash mod 1e6 / 1e6. One-in-a-million assignment
# granularity; plenty for split weights and keeps the arithmetic in
# exactly-representable territory on both engines.
DENOM = 1_000_000


def unit_hash(id_col: str, seed: int = 42, hash_fn: str = "xxhash64") -> F.Column:
    """Deterministic uniform [0,1) value per id on the 1/DENOM grid."""
    if hash_fn == "xxhash64":
        h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(DENOM))
    elif hash_fn == "md5":
        key = F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
        h = F.pmod(
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"),
            F.lit(DENOM),
        )
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    return h / F.lit(float(DENOM))


def split_boundaries(weights: dict[str, float]) -> list[tuple[str, float]]:
    """(name, cumulative upper bound) in dict order, normalized. ONE
    definition shared by the operator and the SQL oracle generator so
    the float boundaries are bit-identical on both engines."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    out, acc = [], 0.0
    for name, w in weights.items():
        acc += w / total
        out.append((name, acc))
    return out


def hash_split(df: DataFrame, weights: dict[str, float], id_col: str = "doc_id",
               seed: int = 42, hash_fn: str = "xxhash64",
               split_col: str = "split") -> DataFrame:
    """Assign every row to a named split with the given weights,
    deterministically by id hash. The last split absorbs the floating
    cumulative boundary's tail, so assignment is total."""
    u = unit_hash(id_col, seed, hash_fn)
    bounds = split_boundaries(weights)
    expr = F.lit(bounds[-1][0])  # last split catches u up to 1.0
    # reversed fold nests so the FIRST boundary is the outermost when:
    # u<b1 -> s1, elif u<b2 -> s2, ..., else last
    for name, ub in reversed(bounds[:-1]):
        expr = F.when(u < F.lit(ub), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def normalized_targets(targets: dict[str, float]) -> dict[str, float]:
    """Target shares normalized to sum 1, in dict order. ONE definition
    shared by ``domain_mix`` and the SQL oracle generator so the float
    literals are bit-identical on both engines."""
    total = float(sum(targets.values()))
    if total <= 0:
        raise ValueError("targets must sum to a positive value")
    return {k: v / total for k, v in targets.items()}


def domain_mix(df: DataFrame, targets: dict[str, float], domain_col: str,
               weight_col: str | None = None, budget: float | None = None,
               id_col: str = "doc_id", seed: int = 42,
               hash_fn: str = "xxhash64") -> DataFrame:
    """Downsample to a target domain mixture (the corpus-mixing step of
    a pretraining pipeline: e.g. "40% web, 30% code, 30% books" by
    tokens): from the OBSERVED per-domain mass (row count, or
    ``sum(weight_col)`` — pass a token count for token-weighted mixing)
    compute the largest total ``T`` the targets permit WITHOUT
    upsampling any domain (``T = min_d mass_d / share_d``, further
    capped by ``budget``), then keep each row with probability
    ``share_d * T / mass_d`` deterministically by id hash. Domains not
    in ``targets`` are dropped; the binding domain (the scarcest
    relative to its share) is kept whole.

    Scale shape: one map-side-combined aggregation collecting
    O(#domains) masses to the driver, then a pure expression filter
    that rides the scan — no corpus shuffle. Determinism: the kept set
    is a property of (id, seed, targets, observed masses) only, so
    reruns and cluster-size changes reproduce it exactly."""
    shares = normalized_targets(targets)
    mass_expr = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    ).cast("double")
    masses = {
        r["d"]: r["m"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(mass_expr.alias("m"))
        .collect()
        if r["d"] in shares
    }
    missing = [d for d in shares if d not in masses or not masses[d] > 0]
    if missing:
        raise ValueError(f"target domains absent from corpus: {missing}")
    t = min(masses[d] / shares[d] for d in shares)
    if budget is not None:
        t = min(t, float(budget))
    u = unit_hash(id_col, seed, hash_fn)
    rate = F.lit(0.0)
    for d in shares:
        rate = F.when(
            F.col(domain_col) == d, F.lit(shares[d] * t / masses[d])
        ).otherwise(rate)
    return df.where(u < rate)


def unimax_rates(masses: dict[str, float], budget: float, max_epochs: float,
                 grid: int = 4) -> dict[str, float]:
    """The closed-form epoch-capped waterfill behind `unimax_mix`,
    exposed pure so the allocation math is unit-testable against hand
    cases. See `unimax_mix` for the algorithm and the IEEE op-order
    contract shared with the SQL oracle."""
    import math

    b, e = float(budget), float(max_epochs)
    langs = sorted(masses, key=lambda d: (masses[d] * e, d))
    n = len(langs)
    caps = [masses[d] * e for d in langs]
    pc, k, pck = 0.0, 0, 0.0
    for i, c in enumerate(caps, start=1):
        pc = pc + c
        if c * (n - i + 1) <= b - (pc - c):
            k, pck = i, pc
        else:
            # Saturation is prefix-monotone on the sorted caps, so the
            # first failure ends the saturated set. EQUIVALENCE NOTE
            # (ADVICE round 6): the SQL oracle takes MAX(i) over ALL
            # rows passing this same test rather than breaking at the
            # first failure; the two agree because monotonicity holds
            # in the shared IEEE op order — both engines evaluate
            # ``c_i * (n-i+1) <= B - (P_i - c_i)`` with identical
            # double literals and accumulation order (the telescoped
            # difference (c_i - c_{i+1})(n - i) <= 0 is exact in any
            # rounding), and exact cap ties at the budget edge evaluate
            # the identical expression on both engines, so no row after
            # the first failure can pass on one engine and not the
            # other.
            break
    m = float(10**grid)
    return {
        d: math.floor(
            min((caps[i - 1] if i <= k else (b - pck) / (n - k)) / masses[d], 1.0)
            * m
        ) / m
        for i, d in enumerate(langs, start=1)
    }


def unimax_mix(df: DataFrame, budget: float, max_epochs: float = 1.0,
               lang_col: str = "lang", weight_col: str | None = None,
               id_col: str = "doc_id", seed: int = 29,
               hash_fn: str = "xxhash64", grid: int = 4) -> DataFrame:
    """UniMax language-balanced sampling (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining", arXiv:2304.09151): spread a token
    ``budget`` as UNIFORMLY as possible across languages without
    repeating any language more than ``max_epochs`` times — no target
    shares needed (the contrast with `domain_mix`, which needs them):
    low-resource languages contribute everything up to their epoch cap,
    the budget left over splits evenly among the rest.

    The allocation is epoch-capped WATERFILLING in closed form: sort
    languages by cap ``c_l = mass_l * max_epochs`` ascending (ties by
    name); with prefix sums ``P_i`` the saturation test
    ``c_i * (n - i + 1) <= B - P_{i-1}`` is prefix-monotone (the
    difference telescopes to ``(c_i - c_{i+1})(n - i) <= 0``), so the
    saturated set is the first ``k`` languages — each keeps its whole
    cap — and every other language gets the fair share
    ``(B - P_k) / (n - k)``. Keep rates ``alloc/mass`` clamp at 1 (a
    filter cannot upsample; true epoch>1 repetition belongs to the
    training loader) and floor to the 10^-grid.

    Determinism contract: the driver computes the SAME closed form the
    SQL oracle does — prefix sums accumulated in the same (cap, lang)
    order, the saturation test written ``B - (P_i - c_i)`` on both
    engines (IEEE: ``P_i - c_i`` is NOT ``P_{i-1}``) — so the kept set
    is a bit-exact property of (ids, seed, budget, observed masses).

    Scale shape, exactly `domain_mix`'s: one map-side-combined
    aggregation collects O(#languages) masses to the driver, the
    waterfill is O(n log n) driver arithmetic, and selection is a pure
    expression filter riding the scan — no corpus shuffle."""
    mass_expr = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    ).cast("double")
    masses = {
        r["d"]: float(r["m"])
        for r in df.groupBy(F.col(lang_col).alias("d"))
        .agg(mass_expr.alias("m"))
        .collect()
        if r["d"] is not None and r["m"] is not None and r["m"] > 0
    }
    if not masses:
        raise ValueError("unimax_mix: no language masses observed")
    b, e = float(budget), float(max_epochs)
    if b <= 0 or e <= 0:
        raise ValueError("unimax_mix: budget and max_epochs must be > 0")
    rates = unimax_rates(masses, b, e, grid)
    u = unit_hash(id_col, seed, hash_fn)
    rate = F.lit(0.0)
    for d in rates:
        rate = F.when(F.col(lang_col) == d, F.lit(rates[d])).otherwise(rate)
    return df.where(u < rate)


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, default: float = 0.0,
                      id_col: str = "doc_id", seed: int = 42,
                      hash_fn: str = "xxhash64") -> DataFrame:
    """Keep each row with its stratum's probability, deterministically
    by id hash: downsampling over-represented sources/languages is the
    standard corpus-mixing operation, and hash-keyed selection makes
    the kept set identical run-to-run (and composable: a 0.5 sample is
    a superset of the 0.25 sample under the same seed)."""
    u = unit_hash(id_col, seed, hash_fn)
    frac = F.lit(float(default))
    for val, p in fractions.items():
        frac = F.when(F.col(strata_col) == val, F.lit(float(p))).otherwise(frac)
    return df.where(u < frac)


def sample_k(df: DataFrame, k: int, id_col: str = "doc_id",
             seed: int = 42, hash_fn: str = "xxhash64") -> DataFrame:
    """Deterministic uniform EXACT-k sample: order by the id unit-hash,
    take the k smallest (ties id-asc). The degenerate (logw = 0) case
    of `dsir_select`'s Gumbel top-k — hash order is uniform order, so
    the k smallest hashes are a uniform k-subset that is a pure
    function of (ids, seed): identical on reruns, cluster sizes, and
    partitionings, unlike ``df.sample`` (partition-seeded) followed by
    a limit (plan-order-dependent).

    Scale shape: TakeOrderedAndProject — per-partition k-heaps, one
    O(k)-row driver merge, NO global sort and NO shuffle. Also the
    composable-subset property: sample_k(k1) ⊂ sample_k(k2) for
    k1 <= k2 under the same seed (both are prefixes of the same hash
    order), so nested eval subsets come free."""
    u = unit_hash(id_col, seed, hash_fn)
    return (
        df.withColumn("_u", u)
        .orderBy(F.asc("_u"), F.asc(id_col))
        .limit(k)
        .drop("_u")
    )


def _bucket(gram, n_buckets: int) -> F.Column:
    """md5-keyed feature-hash bucket — bit-identical across Spark and
    DuckDB (same first-8-hex-chars base-16 parse as `unit_hash`)."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def _doc_features(df: DataFrame, text_col: str, id_col: str,
                  ns: tuple[int, ...], n_buckets: int) -> DataFrame:
    """One row per (doc, feature-bucket occurrence): word n-grams for
    each order in ``ns``, hashed into ``n_buckets``. JVM-side (sequence
    + concat_ws), exploded once over the union of orders."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import tokens

    # STAGE the token array through a real column: referencing the raw
    # tokens() expression from inside the transform lambdas would
    # inline the split() into every element_at — re-splitting the text
    # per element, O(len^2) per doc (measured 2x wall on this op; the
    # plan showed 7 split() occurrences vs 1 staged). The non-cheap
    # multi-referenced alias blocks CollapseProject from undoing this.
    tk = F.col("_tk")

    def order_grams(n: int) -> F.Column:
        # NOTE: the transform lambda must take exactly one parameter —
        # a second one would be bound to the element INDEX by pyspark
        return F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array())

    per_order = [order_grams(n) for n in ns]
    grams = per_order[0]
    for o in per_order[1:]:
        grams = F.concat(grams, o)
    return df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_tk")
    ).select(
        F.col(id_col), F.explode(grams).alias("gram")
    ).select(id_col, _bucket(F.col("gram"), n_buckets).alias("b"))


def dsir_weights(raw: DataFrame, target: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", ns: tuple[int, ...] = (1, 2),
                 n_buckets: int = 1024, alpha: float = 1.0,
                 grid: int = 4) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    model the TARGET distribution (the high-quality seed corpus you
    want more of) and the RAW distribution as bags of hashed n-gram
    features, then score every raw doc by its log importance ratio
    ``sum_f [ log p_target(f) - log p_raw(f) ]`` — docs that look like
    the target score high. Laplace-``alpha`` smoothing keeps empty
    buckets finite.

    Scale shape (the point of hashed features): exactly THREE corpus
    passes — one groupBy collapsing each side into its ``n_buckets``
    count rows (both collected: n_buckets is small by construction —
    the paper uses 10k), and one scoring pass. Totals, smoothing, and
    the log ratio are computed driver-side from the collected counts
    (a separate ``count()`` action per side would re-explode the
    corpus, and a lazily-joined broadcast ratio table would re-execute
    BOTH groupBys inside the broadcast build — the first formulation
    did both and measured 23 s at sf0.1 vs ~7 s for this one). The
    per-bucket ratio applies as a literal array lookup (one
    constant-folded O(n_buckets) array, no join) up to 64k buckets,
    and as a driver-built broadcast dim beyond — the literal-tree
    serial cost measured on the semantic-dedup probe is why large
    bucket counts switch plans. Scoring needs only the doc-grain
    re-aggregation exchange; scores floor to the 10^-grid so
    summation-order drift never changes a verdict.
    Returns ``(id, logw, n_feats)`` for every raw doc."""
    import math

    # raw_f feeds TWO consumers (the bucket-count collect and the
    # scoring pass); localCheckpoint materializes the (id, bucket)
    # int-pair rows once so the tokenize + n-gram build + md5 bucketing
    # of the raw corpus runs ONCE, not twice (round 7; the
    # token_budget/lm_score doctrine — ~16 bytes/occurrence of
    # executor-local disk buys back a full corpus featurization pass,
    # the expensive md5-per-gram part). No arithmetic changes: the
    # scoring expression still consumes the identical occurrence rows.
    raw_f = _doc_features(raw, text_col, id_col, ns, n_buckets).localCheckpoint(
        eager=False
    )
    tgt_f = _doc_features(target, text_col, id_col, ns, n_buckets)
    rc = {r["b"]: r["c"] for r in
          raw_f.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()}
    tc = {r["b"]: r["c"] for r in
          tgt_f.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()}
    denom_r = float(sum(rc.values())) + alpha * n_buckets
    denom_t = float(sum(tc.values())) + alpha * n_buckets
    lr = [
        math.log((tc.get(b, 0) + alpha) / denom_t)
        - math.log((rc.get(b, 0) + alpha) / denom_r)
        for b in range(n_buckets)
    ]
    m = float(10**grid)
    if n_buckets <= 65536:
        lr_arr = F.array(*[F.lit(x) for x in lr])
        scored = raw_f.withColumn(
            "lr", F.element_at(lr_arr, (F.col("b") + 1).cast("int"))
        )
    else:
        ratio = raw.sparkSession.createDataFrame(
            list(enumerate(lr)), "b long, lr double"
        )
        scored = raw_f.join(F.broadcast(ratio), "b", "left")
    return scored.groupBy(id_col).agg(
        (F.floor(F.sum("lr") * m) / m).alias("logw"),
        F.count(F.lit(1)).cast("bigint").alias("n_feats"),
    )


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                ns: tuple[int, ...] = (1, 2), n_buckets: int = 1024,
                alpha: float = 1.0, grid: int = 4,
                seed: int = 42) -> DataFrame:
    """The resampling half of DSIR: draw ``k`` docs WITHOUT replacement
    with probability proportional to their importance weight, via the
    Gumbel top-k trick — key = logw + Gumbel noise, take the k largest.
    The noise is DETERMINISTIC (inverse-CDF of the md5 unit hash,
    ``-ln(-ln(u))``), so the selected set is a property of the data and
    seed: identical on reruns, cluster sizes, and in the SQL oracle.

    Scale shape: `dsir_weights` + one expression column + a global
    top-k = TakeOrderedAndProject (per-partition heaps) — no sort, no
    extra shuffle. Ties (same floored key) break id-asc."""
    w = dsir_weights(raw, target, text_col, id_col, ns, n_buckets, alpha, grid)
    # u strictly inside (0,1): the +0.5/DENOM offset keeps ln finite
    h = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                          F.lit(f":g{seed}"))), 1, 8), 16, 10
               ).cast("long"),
        F.lit(DENOM),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(DENOM))
    m = float(10**grid)
    key = F.floor((F.col("logw") - F.log(-F.log(u))) * m) / m
    return (
        w.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )
