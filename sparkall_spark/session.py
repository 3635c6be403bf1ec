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
    local_dir: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are read from ``SPARK_GRAFT_CPUS`` when present so the
    driver's bench and local tests share one sizing knob.

    ``local_dir`` (or ``SPARK_GRAFT_LOCAL_DIR``) relocates shuffle/spill
    files — e.g. to tmpfs for the bench.  It is OPT-IN: a RAM-backed
    default would make any job whose spill exceeds tmpfs capacity fail
    with ENOSPC where it previously spilled to disk.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # the -Xms pin below must match the EFFECTIVE -Xmx, so a caller
    # overriding spark.driver.memory via extra_conf re-sizes both
    # (an -Xms larger than -Xmx refuses to start the JVM)
    _driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    if extra_conf and "spark.driver.memory" in extra_conf:
        _driver_mem = extra_conf["spark.driver.memory"]
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
        # local-mode driver == the one executor JVM.  Heap sizing was
        # MEASURED (scripts/bench_variance_probe.py + a 1M-pair minhash
        # probe): 8g ages ~25% over a 50-entry session (GC pressure);
        # >=31g swings the shuffle-heavy entries 5-46s run-to-run (lazy
        # page commit + uncompressed-oops at 32g); 16g with AlwaysPreTouch
        # is both aging-free and the fastest steady state (minhash 1.9s
        # vs 3.0s at 8g).  On a real cluster this knob sizes only the
        # driver; executors are sized by the submitter.
        .config("spark.driver.memory", _driver_mem)
        # -Xms == -Xmx (r13): THE fix for the long-documented "variance
        # storms".  Root cause, proven by -Xlog:gc* on a bench-shaped
        # session: the 45s periodic ContextCleaner System.gc() (below)
        # runs a FULL GC, G1 then SHRINKS the committed heap toward
        # MinHeapFreeRatio (observed 16g -> 168M..1G), and the next
        # allocation burst — always e03, the heaviest allocator — must
        # RE-EXPAND the heap, zeroing the fresh gigabytes INSIDE the GC
        # pauses (logged: single "young" pauses of 9.0, 12.2, 17.5 and
        # 26.9 s; e03 passes of 17-60 s carrying 8-34 s of GC).  This
        # was previously mis-attributed to host CPU steal (r8's ~1.7 s
        # young pauses = region zeroing, not stall).  G1 never shrinks
        # below -Xms, so the pin makes re-expansion — the storm —
        # impossible: the periodic full GCs drop to 0.2-0.3 s and a
        # bench-shaped probe read e03 5.95/6.16/6.33 s with 84-95 ms
        # GC per pass (vs 17.8/31.6/7.0 s unpinned, same host).
        # Standard cluster posture anyway (executors run Xms=Xmx).
        #
        # -XX:+AlwaysPreTouch was REMOVED with the pin (r13): it was
        # the r8 answer to lazy-commit zeroing landing mid-query, but
        # with -Xms pinned each page is zeroed at most once per JVM
        # (no uncommit/recommit cycle exists), and pre-touching 16 g at
        # startup measurably HURT compile-heavy first passes
        # (interleaved fresh-JVM e04 pass0: 15-30 s with APT vs a tight
        # 10.6-13.0 s without; full sf0.01 gate suite 161 s -> ~117 s).
        # G1NewSizePercent=35 (r8): a YOUNG-GEN FLOOR so an allocation
        # burst costs the minimum number of young GCs; with the heap
        # pinned this floor is now stable in absolute bytes too
        # (measured neutral without APT — kept for the r8 rationale).
        # SPARK_GRAFT_XMS overrides the pin size (e.g. for probes).
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_XMS', _driver_mem)}"
            " -XX:+UnlockExperimentalVMOptions -XX:G1NewSizePercent=35",
        )
        # Broadcast/torrent blocks are freed by ContextCleaner only
        # after the DRIVER garbage-collects their references; with a
        # large driver heap that can take the whole session, so blocks
        # pile up in storage memory, shrink execution memory, and show
        # up as intermittent JVM-wide GC storms in long multi-query
        # sessions (observed: identical e03 passes swinging 10s -> 99s).
        # The default periodic GC is 30min — far longer than a session.
        .config("spark.cleaner.periodicGC.interval", "45s")
        # Whole-stage-codegen CLASS cache (r13): the default 100
        # entries thrash under a multi-query session — a 50-entry
        # registry compiles several hundred distinct codegen units, so
        # every repeated query re-generates, re-loads and re-JITs its
        # stages from scratch (measured: e03 spends 6-9 s and e29
        # 6-12 s of JIT compiler time PER PASS at steady state with
        # the default; 2000 entries cut e03's warm-pass JIT to ~2.8 s
        # and make the bench warmup ladder actually persist).  Classes
        # live in metaspace/code cache, which sits at ~130 MB of the
        # 240 MB default reserve — headroom verified.  Same posture on
        # cluster executors: the conf is read once at first codegen.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    # shuffle/spill files on tmpfs when the CALLER opts in (bench.py
    # does): on this VM the root disk is virtio with erratic latency,
    # and shuffle-heavy entries (1M-pair minhash) swung 2.5-43s
    # run-to-run purely on I/O.  Not a library default — tmpfs is
    # typically capped at 50% of RAM and a spill-heavy job would die
    # with ENOSPC instead of spilling to disk.
    shm = local_dir or os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if shm:
        try:
            os.makedirs(shm, exist_ok=True)
            builder = builder.config("spark.local.dir", shm)
        except OSError:
            pass
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Two DELIBERATE behaviors would otherwise WARN on every run and
    # bury real warnings (r12): (a) ckpt_release frees checkpoint
    # blocks whose frames are dead by contract
    # (operators/iterate.py — MapPartitionsRDD warns "cannot be
    # recomputed", which is the point); (b) sketch/postings `_meta`
    # side-tables are overwrite-listed by DataSource as
    # "all paths were ignored" (underscore-hidden on purpose).  Raise
    # just those two loggers to ERROR — narrow and best-effort (a
    # log4j2 API drift leaves logging untouched).
    try:
        log4j = spark._jvm.org.apache.logging.log4j
        for cls in (
            "org.apache.spark.rdd.MapPartitionsRDD",
            "org.apache.spark.sql.execution.datasources.DataSource",
        ):
            log4j.core.config.Configurator.setLevel(
                cls, log4j.Level.ERROR
            )
    except Exception:
        pass
    return spark
