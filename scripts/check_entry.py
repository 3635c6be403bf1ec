#!/usr/bin/env python
"""One-entry correctness check: run a __spark_entry__ query and its
DuckDB oracle side-by-side at a given SF and diff the sorted row sets
(the driver's rows+schema+value gate, minus its hashing ceremony —
canonicalization shared with check_all.py via _oracle_common).

Usage: python scripts/check_entry.py e22_dedup_clusters [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from _oracle_common import canon, dtype_kinds, register_views  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from sparkall_spark.session import get_spark  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark()
    q = E.queries()[name]
    sdf = q(spark, sf_dir).toPandas()
    sdf = sdf[sorted(sdf.columns)]
    oracle = E.oracle_sql().get(name)
    if oracle is None:
        print(f"{name}: no oracle; spark rows={len(sdf)}")
        print(sdf.head())
        return 0
    con = duckdb.connect()
    register_views(con, sf_dir)
    odf = con.execute(oracle).df()
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"SCHEMA MISMATCH: spark={list(sdf.columns)} "
              f"oracle={list(odf.columns)}")
        return 1
    sk, ok = dtype_kinds(sdf), dtype_kinds(odf)
    warn = {c: f"{sk[c]}!={ok[c]}" for c in sk if {sk[c], ok[c]} == {"i", "f"}}
    if warn:
        print(f"WARN {name}: int-vs-float kinds {warn}")

    s, o = canon(sdf), canon(odf)
    if s == o:
        print(f"{name}: OK rows={len(s)} cols={list(sdf.columns)}")
        return 0
    print(f"{name}: MISMATCH spark_rows={len(s)} oracle_rows={len(o)}")
    sset, oset = set(s), set(o)
    for r in list(sset - oset)[:5]:
        print("  spark-only:", r)
    for r in list(oset - sset)[:5]:
        print("  oracle-only:", r)
    return 1


if __name__ == "__main__":
    sys.exit(main())
