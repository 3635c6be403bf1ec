#!/usr/bin/env python
"""Per-entry cost profile for the optimization rounds (guide §1).

For each named entry, in ONE bench-config session after the bench's
warmup ladder: N timed passes, each split into CONSTRUCT (the entry
function call — eager driver jobs live here: trainings, sketch
lifecycles, index writes) and ACTION (`.count()`, the bench's timed
action), plus the number of Spark JOBS each pass submitted (read from
the DAGScheduler's job-id counter — scheduling overhead at sf0.1 is
job-count-dominated, the r12 lesson).

Usage: python scripts/profile_entries.py e29_index_telemetry e03_... [--passes N]
       (no names = the bench list)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from sparkall_spark.session import get_spark  # noqa: E402


def _job_count(spark) -> int:
    try:
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId().get()
    except Exception:
        return -1


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 4
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])
    names = args or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "sparkall-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        local_dir="/dev/shm/spark-bench",
    )
    queries = E.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for warm_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            try:
                queries[name](spark, warm_dir).count()
            except Exception as exc:
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    print(f"# entry pass construct_s action_s total_s jobs rows")
    for name in names:
        fn = queries[name]
        for p in range(passes):
            j0 = _job_count(spark)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            j1 = _job_count(spark)
            print(
                f"{name} {p} {t1 - t0:.3f} {t2 - t1:.3f} "
                f"{t2 - t0:.3f} {j1 - j0} {n}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
