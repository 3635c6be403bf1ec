#!/usr/bin/env python
"""One-entry correctness check: run a __spark_entry__ query and its
DuckDB oracle side-by-side at a given SF and diff the sorted row sets
(the driver's rows+schema+value gate, minus its hashing ceremony).

Usage: python scripts/check_entry.py e22_dedup_clusters [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from sparkall_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


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
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.execute(oracle).df()
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"SCHEMA MISMATCH: spark={list(sdf.columns)} "
              f"oracle={list(odf.columns)}")
        return 1

    def canon(df):
        def norm(v):
            if isinstance(v, float):
                return None if v != v else round(v, 6)  # NaN -> None
            return v

        return sorted(
            (
                tuple(norm(v) for v in row)
                for row in df.itertuples(index=False, name=None)
            ),
            key=repr,  # None-safe ordering
        )

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
