"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from fluent_plugin_kubernetes_metadata_filter_spark.session import build_session

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
DRIVER_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(val):
    if val is None:
        return ""
    if isinstance(val, float):
        return f"{val:.9g}"
    if isinstance(val, bool):
        return str(bool(val)).lower()
    return str(val)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main(only=None):
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    spark = build_session(app="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # rebase aux-table paths to the sf under comparison (ADVICE: the
    # oracle must never silently read sf0.01 aux dims for another sf)
    from fluent_plugin_kubernetes_metadata_filter_spark.datagen import ensure_sf
    from fluent_plugin_kubernetes_metadata_filter_spark.oracle import oracle_queries

    oq = oracle_queries(aux_dir=ensure_sf(SF_DIR))
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            # a typo'd name must FAIL, not silently check nothing and
            # exit 0 with "FAILURES: 0"
            raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in oq:
            print(f"{name:26s} rows={len(srows):8d}  (rows-only, no oracle)  {t1-t0:5.1f}s")
            continue
        try:
            res = con.execute(oq[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"{name:26s} ORACLE SQL ERROR: {ex}")
            failures += 1
            continue
        sc, ss = frame_sig(scols, srows)
        oc, os_ = frame_sig(ocols, orows)
        ok_cols = sc == oc
        ok_rows = len(ss) == len(os_)
        ok_vals = ss == os_
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"{name:26s} {status}: cols={ok_cols} rowcount {len(ss)} vs {len(os_)} vals={ok_vals}")
            if not ok_cols:
                print("   spark cols:", sc, "\n   oracle cols:", oc)
            if ok_cols and not ok_vals:
                sset = set(ss)
                oset = set(os_)
                for d in list(sset - oset)[:3]:
                    print("   spark-only:", d)
                for d in list(oset - sset)[:3]:
                    print("   oracle-only:", d)
        else:
            print(f"{name:26s} OK rows={len(ss):8d}  spark={t1-t0:5.1f}s duck={time.time()-t1:4.1f}s")
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(set(sys.argv[1:]) or None) else 0)
