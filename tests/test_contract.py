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
