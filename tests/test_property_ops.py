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


def test_pinned_prefix_sum_empty_input_keeps_value_type(spark):
    """The empty-input branch must produce the SAME cum type as the
    non-empty branch — for a double value column that is double, not a
    bigint cast (the schema must not depend on whether rows exist)."""
    schema = "id long, v double"
    full = spark.createDataFrame([(1, 1.5), (2, 2.5)], schema)
    empty = spark.createDataFrame([], schema)
    t_full = dict(pinned_prefix_sum(full, [F.asc("id")], "v").dtypes)["cum"]
    t_empty = dict(pinned_prefix_sum(empty, [F.asc("id")], "v").dtypes)["cum"]
    assert t_full == t_empty == "double"
    # and for integral values both branches widen to bigint
    fi = spark.createDataFrame([(1, 5)], "id long, v int")
    ei = spark.createDataFrame([], "id long, v int")
    assert dict(pinned_prefix_sum(fi, [F.asc("id")], "v").dtypes)["cum"] == "bigint"
    assert dict(pinned_prefix_sum(ei, [F.asc("id")], "v").dtypes)["cum"] == "bigint"


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


domains_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),   # id
        st.sampled_from(["a", "b", "c", "d"]),       # domain
        st.integers(min_value=1, max_value=500),     # weight (tokens)
    ),
    min_size=4,
    max_size=60,
    unique_by=lambda t: t[0],
).filter(lambda rows: {"a", "b"} <= {d for _, d, _ in rows})


@settings(max_examples=10, deadline=None)
@given(rows=domains_strategy, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_domain_mix_matches_sequential_model(spark, rows, seed):
    """The kept set equals a sequential Python model running the SAME
    mass/rate arithmetic and the SAME md5 unit hash — for any corpus
    shape, target imbalance, and seed."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import (
        domain_mix,
        normalized_targets,
    )

    targets = {"a": 0.7, "b": 0.3}
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    got = {r.doc_id for r in
           domain_mix(df, targets, "lang", weight_col="w", seed=seed,
                      hash_fn="md5").select("doc_id").collect()}

    import hashlib

    shares = normalized_targets(targets)
    masses = {}
    for _, d, w in rows:
        if d in shares:
            masses[d] = masses.get(d, 0.0) + float(w)
    masses = {d: float(m) for d, m in masses.items()}
    t = min(masses[d] / shares[d] for d in shares)
    want = set()
    for i, d, _ in rows:
        if d not in shares:
            continue
        h = int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16) % 1_000_000
        if h / 1_000_000.0 < shares[d] * t / masses[d]:
            want.add(i)
    assert got == want


line_strategy = st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "javascript", "x"]),
             min_size=0, max_size=8).map(" ".join)
    .map(lambda s: s)  # bare line
    .flatmap(lambda s: st.sampled_from([s, s + ".", s + "?"])),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(line_strategy, min_size=1, max_size=8))
def test_clean_lines_matches_sequential_model(spark, docs):
    """clean_lines equals the rule set replayed sequentially in Python
    for any line soup: word-count, terminal punctuation, banned
    substring, and the page-level gates."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.text import clean_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in clean_lines(df).collect()}

    for i, text in rows:
        lines = text.split("\n")
        kept = [
            l for l in lines
            if len(l.strip().split()) >= 5
            and l.strip()[-1:] in '.!?"'
            and "javascript" not in l.lower()
        ]
        keep = len(kept) >= 3 and "lorem ipsum" not in text.lower() and "{" not in text.lower()
        r = got[i]
        assert r.clean_text == "\n".join(kept)
        assert r.n_kept == len(kept) and r.n_dropped == len(lines) - len(kept)
        assert r.keep == keep, (i, text)


@settings(max_examples=8, deadline=None)
@given(
    paras=st.lists(st.sampled_from(["aa bb", "cc dd", "ee ff", "gg hh"]),
                   min_size=1, max_size=6),
    evals=st.sets(st.sampled_from(["aa bb", "cc dd", "ee ff", "gg hh"]),
                  max_size=3),
)
def test_paragraph_scrub_model_and_idempotent(spark, paras, evals):
    """Scrubbed text equals the sequential model (drop paragraphs whose
    normalized form is in the eval set, keep order), and scrubbing the
    OUTPUT again is a no-op — the op is idempotent."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.dedup import paragraph_scrub

    doc = spark.createDataFrame([(1, "\n\n".join(paras))], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(i, p) for i, p in enumerate(sorted(evals))] or [(0, "zz")],
        "doc_id long, text string",
    )
    out = paragraph_scrub(doc, ev).collect()[0]
    want = [p for p in paras if p not in evals]
    assert out.clean_text == "\n\n".join(want)
    assert out.n_kept == len(want) and out.n_scrubbed == len(paras) - len(want)

    again = paragraph_scrub(
        spark.createDataFrame([(1, out.clean_text)], "doc_id long, text string"), ev
    ).collect()[0]
    assert again.clean_text == out.clean_text


@given(
    masses=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=100_000).map(float),
        min_size=1, max_size=8,
    ),
    budget=st.integers(min_value=1, max_value=500_000).map(float),
    epochs=st.sampled_from([0.25, 0.5, 0.9, 1.0, 2.0]),
)
@settings(max_examples=200, deadline=None)
def test_unimax_rates_invariants(masses, budget, epochs):
    """Waterfill invariants on random inputs: every rate in [0, min(1,
    epochs)+grid]; total allocated tokens never exceed budget + total
    flooring slack; when the budget covers every cap, all rates hit
    min(1, epochs) exactly (up to the floor grid); allocations weakly
    favor smaller languages (rate non-increasing as mass grows, the
    uniformity property UniMax is for)."""
    from fluent_plugin_kubernetes_metadata_filter_spark.ops.sampling import unimax_rates

    rates = unimax_rates(masses, budget, epochs)
    assert set(rates) == set(masses)
    cap_rate = min(1.0, epochs)
    for d, r in rates.items():
        assert 0.0 <= r <= cap_rate + 1e-4, (d, r)
    allocated = sum(rates[d] * masses[d] for d in masses)
    slack = sum(masses.values()) * 1e-4  # grid flooring slack
    assert allocated <= budget + slack or allocated <= sum(
        masses[d] * cap_rate for d in masses
    ) + slack
    if budget >= sum(masses.values()) * epochs:
        floor_cap = int(cap_rate * 10_000) / 10_000
        assert all(abs(r - floor_cap) < 1e-9 for r in rates.values()), rates
    by_mass = sorted(masses, key=lambda d: (masses[d], d))
    for a, b in zip(by_mass, by_mass[1:]):
        assert rates[a] >= rates[b] - 1e-4, (a, b, rates)
