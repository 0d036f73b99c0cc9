"""Datagen determinism + scenario coverage + driver-contract sanity."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from fluent_plugin_kubernetes_metadata_filter_spark import datagen
from fluent_plugin_kubernetes_metadata_filter_spark.io import aux_dir


def test_generation_deterministic(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    datagen.generate_sf(str(a), "sf0.001")
    datagen.generate_sf(str(b), "sf0.001")
    for f in sorted(os.listdir(a)):
        assert (a / f).read_bytes() == (b / f).read_bytes(), f


def test_scenarios_present_in_sf001():
    """Every golden branch must have rows at the smallest scale."""
    base = aux_dir("/root/testdata/sf0.001")
    con = duckdb.connect()
    t = f"read_parquet('{base}/transcripts.parquet')"
    n = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
    assert n > 5000
    # pods + containers + non-matching tags all present
    kinds = dict(
        con.execute(
            f"""SELECT CASE WHEN tool LIKE 'var.log.pods.%' THEN 'pods'
                           WHEN tool LIKE 'var.log.containers.%' THEN 'containers'
                           ELSE 'other' END, count(*) FROM {t} GROUP BY 1"""
        ).fetchall()
    )
    assert set(kinds) == {"pods", "containers", "other"}
    # ghost namespaces (orphans) and future namespaces (as-of) referenced
    ghosts = con.execute(f"SELECT count(*) FROM {t} WHERE tool LIKE '%ghost-ns%'").fetchone()[0]
    assert ghosts > 0
    futures = con.execute(
        f"SELECT count(*) FROM {t} WHERE tool LIKE 'var.log.containers.vanished%ns-2%'"
    ).fetchone()[0]
    assert futures > 0
    # skew: the hot (default) pod dominates
    hot = con.execute(
        f"SELECT count(*) FROM {t} WHERE tool LIKE '%_default_%'"
    ).fetchone()[0]
    assert hot / n > 0.2


def test_dims_fixed_size_across_sf():
    a = aux_dir("/root/testdata/sf0.001")
    b = aux_dir("/root/testdata/sf0.01")
    con = duckdb.connect()
    for dim in ("pods_dim", "namespaces_dim"):
        na = con.execute(f"SELECT count(*) FROM read_parquet('{a}/{dim}.parquet')").fetchone()[0]
        nb = con.execute(f"SELECT count(*) FROM read_parquet('{b}/{dim}.parquet')").fetchone()[0]
        assert na == nb  # dims are broadcast dimensions, not fact tables


def test_driver_contract_shape():
    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query; rows-only keys are the
    # documented xxhash-based ones
    assert set(oq) <= set(qs)
    rows_only = set(qs) - set(oq)
    assert rows_only == set(), rows_only
    import inspect

    for name, fn in qs.items():
        assert len(inspect.signature(fn).parameters) == 2, name
