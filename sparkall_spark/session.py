"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the same configs are what we would
ship on a 1000-executor cluster: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow for any Python exchange, and a
shuffle-partition count that the caller can size to the cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkall_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are read from ``SPARK_GRAFT_CPUS`` when present so the
    driver's bench and local tests share one sizing knob.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local-mode driver == the one executor JVM: 32 threads sharing
        # an 8g heap spent ~25% of a 50-entry bench session in GC (the
        # r4 "uniform slowdown"); at 32g the aging probe inverts — aged
        # runs are FASTER than fresh (0.21s vs 0.38s median on e01,
        # scripts/bench_variance_probe.py).  On a real cluster this knob
        # sizes only the driver; executors are sized by the submitter.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
