#!/usr/bin/env python
"""All-entries correctness self-check: run EVERY __spark_entry__ query
against its DuckDB oracle in ONE Spark session and write a SELFCHECK
artifact in the driver's CORRECTNESS row format.

This exists because the driver's CORRECTNESS_r09.json came back as an
empty ``{}`` (harness flake) and left round 9 without a hard receipt;
the judge's VERDICT (r9 Next #1) asked for an in-repo fallback that
runs every round.  Row format mirrors CORRECTNESS_r08.json:

    {"<entry>": {"rows_match": bool, "schema_match": bool,
                 "hash_match": bool, "spark_rows": int,
                 "oracle_rows": int, "err": str|null,
                 "seconds": float, "checked": "oracle"|"rows-only"}, ...}

``seconds`` is the wall-clock for the entry's Spark run + oracle
compare (the profile the r10 VERDICT asked to commit each round —
the driver's gate went silent twice and the suspect is its time
budget, so the per-entry cost tail must be visible in-repo).
``checked`` makes the weaker rows-only rows impossible to over-read
as value-verified (r10 ADVICE).

``hash_match`` here is a NaN-safe sorted row-set compare (the driver's
value gate minus its hashing ceremony — scripts/_oracle_common.canon,
shared with check_entry.py).  It is dtype-blind; an int-vs-float kind
split between the two engines is recorded as ``dtype_warn`` (the
driver's stricter gate may flag what this one passes).  Entries
without an oracle get the weaker rows-only check the driver also
applies (rows_match = spark ran and returned >= 0 rows;
hash_match = null).

Per-entry cache pressure is bounded: every entry function from
``queries()`` calls release_caches() on entry (the _with_teardown
wrapper), so at most one entry's persisted frames are pinned at a
time; a final release runs after the loop.

Gate BUDGET (r12, VERDICT r11 Next #1): the driver's CORRECTNESS file
came back empty in r9 AND r10 and returned exactly when this gate got
cheap (920 s -> 287 s), so the time-budget hypothesis is the best
explanation — and nothing structural stops a future leg from regrowing
the tail.  This script therefore ENFORCES a ceiling on full sf0.01
runs: any entry over ``SPARKALL_GATE_ENTRY_CEIL`` seconds (default 45)
or a suite total over ``SPARKALL_GATE_SUITE_CEIL`` seconds (default
400) fails the run (non-zero exit + a loud ``BUDGET`` line + a
``_budget`` block in the artifact), so a budget regression is caught
by the builder in-round instead of by a silent driver ``{}``.
Enforcement applies only to FULL runs at an sf0.01 dir (a prefix-
filtered or other-SF invocation still reports, but cannot fairly be
held to the full-suite numbers); the env vars override the defaults.

Usage: python scripts/check_all.py [out.json] [sf_dir] [only_prefix...]
  default out = SELFCHECK.json, sf_dir = /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from _oracle_common import canon, dtype_kinds, register_views  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from sparkall_spark.session import get_spark  # noqa: E402

#: sf0.01 full-run gate budget (seconds) — overridable via env
ENTRY_CEIL_S = float(os.environ.get("SPARKALL_GATE_ENTRY_CEIL", "45"))
SUITE_CEIL_S = float(os.environ.get("SPARKALL_GATE_SUITE_CEIL", "400"))


def budget_breaches(
    results: dict, suite_seconds: float,
    entry_ceil: float = ENTRY_CEIL_S, suite_ceil: float = SUITE_CEIL_S,
) -> list[str]:
    """Human-readable breach lines for the gate budget (empty = ok).
    Pure function of the artifact rows so the ceiling itself is
    unit-testable without a 5-minute gate run."""
    breaches = [
        f"entry {name} took {row['seconds']:.1f}s > {entry_ceil:.0f}s ceiling"
        for name, row in results.items()
        if row.get("seconds", 0) > entry_ceil
    ]
    if suite_seconds > suite_ceil:
        breaches.append(
            f"suite took {suite_seconds:.0f}s > {suite_ceil:.0f}s ceiling"
        )
    return breaches


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SELFCHECK.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = sys.argv[3:]

    spark = get_spark()
    con = duckdb.connect()
    register_views(con, sf_dir)

    queries = E.queries()
    oracles = E.oracle_sql()
    results: dict[str, dict] = {}
    n_fail = 0
    t_all = time.time()
    for name, q in queries.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None,
               "checked": "oracle"}
        t0 = time.time()
        try:
            sdf = q(spark, sf_dir).toPandas()
            sdf = sdf[sorted(sdf.columns)]
            row["spark_rows"] = int(len(sdf))
            oracle = oracles.get(name)
            if oracle is None:
                # weaker rows-only check, same as the driver's fallback
                row.update(rows_match=True, schema_match=True,
                           hash_match=None, checked="rows-only")
            else:
                odf = con.execute(oracle).df()
                odf = odf[sorted(odf.columns)]
                row["oracle_rows"] = int(len(odf))
                row["rows_match"] = len(sdf) == len(odf)
                row["schema_match"] = list(sdf.columns) == list(odf.columns)
                row["hash_match"] = (row["schema_match"]
                                     and canon(sdf) == canon(odf))
                if row["schema_match"]:
                    sk, ok = dtype_kinds(sdf), dtype_kinds(odf)
                    warn = {
                        c: f"{sk[c]}!={ok[c]}"
                        for c in sk
                        if {sk[c], ok[c]} == {"i", "f"}
                    }
                    if warn:
                        row["dtype_warn"] = warn
                        print(f"WARN {name}: int-vs-float kinds {warn} "
                              "(values equal; driver schema gate may be "
                              "stricter)", flush=True)
        except Exception:
            row["err"] = traceback.format_exc(limit=3)
        row["seconds"] = round(time.time() - t0, 3)
        ok = (row["err"] is None and row["rows_match"]
              and row["schema_match"] and row["hash_match"] in (True, None))
        n_fail += 0 if ok else 1
        results[name] = row
        print(f"{'OK ' if ok else 'FAIL'} {name:34s} "
              f"rows={row['spark_rows']} vs {row['oracle_rows']} "
              f"({time.time() - t0:.1f}s)", flush=True)

    from sparkall_spark.operators._cache import release_caches

    release_caches()
    suite_seconds = time.time() - t_all
    # the budget holds for FULL runs at sf0.01 (the driver-gate shape);
    # filtered/other-SF invocations report but are not enforced
    enforced = not only and "sf0.01" in os.path.basename(
        os.path.normpath(sf_dir)
    )
    breaches = budget_breaches(results, suite_seconds) if enforced else []
    out = dict(results)
    out["_budget"] = {
        "entry_ceiling_s": ENTRY_CEIL_S, "suite_ceiling_s": SUITE_CEIL_S,
        "suite_seconds": round(suite_seconds, 1), "enforced": enforced,
        "breaches": breaches,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    n_rows_only = sum(1 for r in results.values()
                      if r.get("checked") == "rows-only")
    slowest = sorted(results.items(), key=lambda kv: -kv[1]["seconds"])[:5]
    print("# slowest entries: "
          + ", ".join(f"{n}={r['seconds']:.1f}s" for n, r in slowest))
    for line in breaches:
        print(f"BUDGET BREACH: {line} — the driver's correctness gate "
              "went silent at this cost level in r9/r10; shrink the "
              "entry or its oracle before shipping", flush=True)
    print(f"\n{len(results) - n_fail}/{len(results)} green "
          f"({n_rows_only} rows-only, rest value-verified) "
          f"in {suite_seconds:.0f}s -> {out_path}")
    return 1 if (n_fail or breaches) else 0


if __name__ == "__main__":
    sys.exit(main())
