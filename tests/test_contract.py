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
    # the single remaining rows-only key: minhash_pairs (xxhash64-based
    # banding, value-gated via its minhash_jaccard_verified twin).
    # simhash/simhash_pairs run the md5 token-hash variant and
    # lsh_neardup's planes/bands are recomputed in SQL, so all three
    # are oracle-gated now.
    assert queries - oracles == {"minhash_pairs"}


def test_queries_are_callables_with_uniform_signature():
    import inspect

    import __spark_entry__ as e

    for name, fn in e.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, (name, params)
