"""Driver-contract invariants over __spark_entry__."""

import sys

sys.path.insert(0, "/root/repo")


def test_every_oracle_key_has_a_query():
    """oracle_sql() must be a subset of queries(): an oracle for a
    missing query would fail the driver's gate at runtime, and the
    column-name contract means the two are maintained as pairs."""
    import __spark_entry__ as e

    queries = set(e.queries())
    oracles = set(e.oracle_sql())
    assert oracles <= queries, oracles - queries
    # round 4: zero rows-only queries. minhash_pairs/simhash/
    # simhash_pairs run md5 hash variants DuckDB recomputes
    # bit-identically, and lsh_neardup's planes/bands are rebuilt in
    # SQL — every driver query is value-gated.
    assert queries - oracles == set()


def test_driver_gate_window_covers_every_ungated_query():
    """The per-round driver correctness gate is POSITIONAL: it records
    rows for the first ~50 queries() entries only (round 5 proved this
    silently — 18 of 68 keys got no driver row). Loud contract: every
    queries() key must either already appear in some recorded
    CORRECTNESS_r*.json or sit inside the upcoming 50-entry window.
    A key that is neither has escaped the gate of record, and adding
    it to the dict tail without rotating the window is a bug."""
    import glob
    import json

    import __spark_entry__ as e

    keys = list(e.queries())
    window = set(keys[:50])
    gated: set[str] = set()
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(p) as fh:
            gated |= set(json.load(fh))
    ungated = set(keys) - gated - window
    assert ungated == set(), (
        f"queries with no driver row and outside the gate window: {ungated}"
    )


def test_queries_are_callables_with_uniform_signature():
    import inspect

    import __spark_entry__ as e

    for name, fn in e.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, (name, params)


def test_oracle_outputs_use_only_hashable_types():
    """The driver's value hasher canonicalizes Arrow scalars;
    DECIMAL128 (round 3: pricing_summary) and HUGEINT (round 2:
    events_sessionize) silently hash-mismatch even when every value is
    equal. Sweep every oracle's DuckDB DESCRIBE output and reject any
    type outside the proven-green set — catching the next implicit
    widening at test time instead of in CORRECTNESS_r{N}."""
    import duckdb

    import __spark_entry__ as e

    allowed = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
               "TIMESTAMP", "TIMESTAMP_NS"}
    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = {}
    for name, sql in e.oracle_sql().items():
        types = con.execute(f"DESCRIBE ({sql})").fetchall()
        offending = {c: ty for c, ty, *_ in types if ty not in allowed}
        if offending:
            bad[name] = offending
    assert not bad, f"oracle outputs with non-hashable types: {bad}"


def test_bench_labels_name_real_driver_queries():
    """Every per-query label bench.py reports must be a queries() key,
    so BENCH_r{N}.json rows stay joinable against CORRECTNESS_r{N}.json
    round-over-round. The two enrich_route_write variants are
    pipeline-level composites (they run pipeline.run, which has no
    single-query equivalent) and are the only sanctioned exceptions."""
    import bench
    import __spark_entry__ as e

    # query_list only touches spark/sf_dir inside the lazy thunks, so
    # the label inventory is extractable without a session.
    labels = [name for name, _ in bench.query_list(None, "")]
    assert len(labels) == len(set(labels)), "duplicate bench labels"
    composites = {"enrich_route_write", "enrich_route_write_direct"}
    unknown = set(labels) - composites - set(e.queries())
    assert unknown == set(), unknown
