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
