#!/usr/bin/env python
"""Large-scale parallelism spot-probe (VERDICT r12 next #6).

At sf0.1 the bench is fixed-cost dominated (driver/job scheduling,
tiny tasks), so the driver's 8-vs-32-core ratios sit ~1 for every
entry and say nothing about parallel scaling.  This probe synthesizes
a deterministic 10x corpus (documents unioned 10 times with disjoint
doc_id ranges and a per-replica salt token, so near-dup pair counts
grow ~linearly, not quadratically) and times two heavy paths where
cores CAN show:

- e03's word-leg machinery (minhash_dedup_pairs, shuffle+salt+est) —
  compute-bound verify;
- e29's index lifecycle (bucket-aligned build -> save -> append ->
  compact) — shuffle/write-bound.

Run twice on a quiet host and compare:

    SPARK_GRAFT_CPUS=32 python scripts/scale_probe.py
    SPARK_GRAFT_CPUS=8  python scripts/scale_probe.py

Methodology artifact only (BENCH_NOTES.md) — NOT part of bench.py's
driver contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkall_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "scale-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        local_dir="/dev/shm/spark-bench",
    )
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    # every token carries a replica prefix, so replica vocabularies are
    # DISJOINT: the near-dup structure of each replica is preserved and
    # pair counts grow linearly in the replication factor (a plain
    # copy, or a weak salt, makes the replicas near-dups of each other
    # — a 10-clique per document and a ~50x pair blowup; measured
    # 128 s/pass before this fix vs the intended ~10x scaling)
    reps = [
        docs.select(
            (F.col("doc_id") + F.lit(k * 100_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.lower(F.col("text")), r"\s+"),
                    lambda t: F.concat(F.lit(f"r{k}"), t),
                ),
                " ",
            ).alias("text"),
            "n_chars",
        )
        for k in range(10)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big = big.persist()
    n = big.count()
    print(f"# corpus rows: {n} (cpus={cpus})", flush=True)

    from sparkall_spark.operators import dedup as D
    from sparkall_spark.operators._cache import release_caches
    from sparkall_spark.operators.postings import (
        append_postings,
        build_postings,
        compact_postings,
        save_postings,
    )

    def word_leg() -> float:
        t0 = time.perf_counter()
        D.minhash_dedup_pairs(
            big, threshold=0.9, broadcast_reps=True,
            candidate_strategy="shuffle", est_prefilter=True,
        ).count()
        dt = time.perf_counter() - t0
        release_caches()
        return dt

    def lifecycle() -> float:
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="scaleprobe_", dir="/dev/shm")
        t0 = time.perf_counter()
        save_postings(
            build_postings(big.filter(F.col("doc_id") % 5 != 0),
                           n_buckets=16),
            d, n_buckets=16, prebucketed=True,
        )
        append_postings(
            build_postings(big.filter(F.col("doc_id") % 5 == 0),
                           n_buckets=16),
            d, prebucketed=True,
        )
        compact_postings(spark, d)
        dt = time.perf_counter() - t0
        shutil.rmtree(d)
        return dt

    for name, fn in (("e03_word_x10", word_leg), ("e29_lifecycle_x10",
                                                  lifecycle)):
        fn()  # warm
        times = sorted(round(fn(), 2) for _ in range(3))
        print(f"{name} cpus={cpus}: min={times[0]} all={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
