#!/usr/bin/env python
"""Variance probe for the headline bench (VERDICT r4 item 3).

Question: is the uniform ~10-15% shared-entry slowdown recorded in
BENCH_r04 a per-query plan regression, or session-level overhead that
accumulates over a 50-entry registry run (registry warmup, per-entry
cache teardown, JVM heap growth)?

Method: in ONE session, time a fixed unchanged entry (e01_dedup_exact)
immediately after warmup ("fresh"), then run the full bench entry list
once to age the session, then time e01 again ("aged").  A significant
fresh->aged delta on identical code + data isolates session aging as
the cause; parity acquits it.

Run on an otherwise-idle machine:  python scripts/bench_variance_probe.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from sparkall_spark.session import get_spark  # noqa: E402

PROBE = "e01_dedup_exact"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def time_probe(queries, spark, n=5) -> list[float]:
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        queries[PROBE](spark, SF_DIR).count()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    spark = get_spark(
        "bench-variance-probe", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    queries = E.queries()
    # identical warmup to bench.py: JIT the plan shapes at tiny SF
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries[PROBE](spark, "/root/testdata/sf0.001").count()

    fresh = time_probe(queries, spark)

    # age the session exactly the way a bench run does: every entry once
    t0 = time.perf_counter()
    for name in BENCH_QUERIES:
        queries[name](spark, SF_DIR).count()
    age_cost = round(time.perf_counter() - t0, 1)

    aged = time_probe(queries, spark)

    report = {
        "probe": PROBE,
        "fresh": fresh,
        "aged": aged,
        "fresh_median": statistics.median(fresh),
        "aged_median": statistics.median(aged),
        "aging_pass_sec": age_cost,
        "aged_over_fresh": round(
            statistics.median(aged) / statistics.median(fresh), 3
        ),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
