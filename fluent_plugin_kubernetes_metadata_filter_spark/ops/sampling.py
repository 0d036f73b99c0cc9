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
