"""Property-based tests for the distributed prefix-sum primitive and
the deterministic sampling operators: random inputs checked against a
sequential Python model. Hypothesis generates the datasets; each case
runs one batched Spark job (module-scoped session from conftest)."""

import hypothesis.strategies as st
import pyspark.sql.functions as F
from hypothesis import given, settings

from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import (
    hash_split,
    split_boundaries,
)
from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import pinned_prefix_sum

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),          # id
        st.integers(min_value=0, max_value=10**6),          # value
        st.integers(min_value=0, max_value=3),              # coarse key (ties!)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy, nparts=st.integers(min_value=1, max_value=7))
def test_pinned_prefix_sum_matches_sequential_model(spark, rows, nparts):
    """cum over (key desc, id asc) equals the sequential prefix sum for
    ANY input distribution, tie structure, and physical partitioning."""
    df = spark.createDataFrame(rows, "id long, v long, k long").repartition(nparts)
    got = {
        r.id: r.cum
        for r in pinned_prefix_sum(df, [F.desc("k"), F.asc("id")], "v").collect()
    }
    acc, want = 0, {}
    for (i, v, k) in sorted(rows, key=lambda t: (-t[2], t[0])):
        acc += v
        want[i] = acc
    assert got == want


weights_strategy = st.lists(
    st.floats(min_value=0.01, max_value=10.0, allow_nan=False),
    min_size=1,
    max_size=5,
).map(lambda ws: {f"s{i}": w for i, w in enumerate(ws)})


@settings(max_examples=12, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                    max_size=50, unique=True),
       weights=weights_strategy,
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_hash_split_total_and_model_exact(spark, ids, weights, seed):
    """Every id gets exactly one split; the assignment equals the
    sequential model built from the SAME unit-hash arithmetic and the
    SAME boundary floats (split_boundaries is the single source)."""
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.split
           for r in hash_split(df, weights, seed=seed, hash_fn="md5").collect()}
    assert set(got) == set(ids)
    import hashlib

    bounds = split_boundaries(weights)
    for i in ids:
        h = int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16) % 1_000_000
        u = h / 1_000_000.0
        want = bounds[-1][0]
        for name, ub in bounds:
            if u < ub:
                want = name
                break
        assert got[i] == want, (i, u, bounds)
