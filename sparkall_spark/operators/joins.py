"""Join-side reduction utilities (extension; no reference analog —
the reference joins relations as-is, `SparkExecutor.scala` join path).

The 100 TB problem these address: a fact-table join whose other side
is selective.  Shuffling the full fact table to discover that 97% of
its rows have no partner is the single largest avoidable cost in a
big join; the classic fix is a semi-join reduction — broadcast a
compact membership summary of the selective side and drop partnerless
fact rows BEFORE the shuffle.

Spark's own runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) inject exactly
this rewrite, but only when the optimizer can both see the selective
scan inside the same query plan and estimate its selectivity.  An
explicit operator is for the cases it can't: the build side is a
separately-computed frame (a dedup ledger, yesterday's hot-key list, a
trained vocabulary), the join is assembled across pipeline stages, or
the reduction itself should be persisted and reused.  The bitmap
primitives are shared with the decontamination bloom
(``operators/decontam.py:bloom_bitmap/bloom_might_contain``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from sparkall_spark.operators.decontam import (
    bloom_bitmap,
    bloom_might_contain,
)


#: column-path ceiling: above this the per-row copy of the bitmap
#: array through the one-row join dominates (measured: a 2^20-bit
#: bitmap costs ~3x a 2^17 one on the same probe)
_BLOOM_COLUMN_MAX_BITS = 1 << 17


def bloom_semi_reduce(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int | None = None,
    k: int = 5,
    impl: str = "auto",
) -> DataFrame:
    """Filter ``probe`` to rows whose key MIGHT occur in
    ``build[build_key]`` — a map-only semi-join reduction.

    Contract (no false negatives, by Bloom construction): joining the
    reduced probe side to ``build`` afterwards returns EXACTLY the
    rows the unreduced join would — the reduction only sheds rows that
    cannot have a partner, plus it keeps a false-positive residue of
    roughly ``(1 - e^(-k*n/m))^k`` that the real join removes.  Use it
    in front of any inner/semi equi-join whose build side is
    selective; it is pure overhead when most probe keys match, so
    gate scheduling on an estimate (e.g. a KMV overlap sketch) when in
    doubt.

    ``m_bits=None`` (default) sizes the filter to the build side: one
    bounded count, then ~16 bits per key rounded up to a power of two
    (fpp ~0.1% at k=5).  Two implementations, ``impl="auto"`` picks:

    - ``"column"`` (small bitmaps, <= 2^17 bits): the single-row
      ``array<bigint>`` bitmap joins in (BroadcastNestedLoopJoin
      against ONE row) and the membership check is pure Column algebra
      — zero Python.  Above the ceiling this path is measurably wrong:
      the joined row carries the whole array, so every probe row pays
      a bitmap-sized copy.
    - ``"arrow"`` (any size): the k bit POSITIONS are still computed
      JVM-side (the hash must be the build side's xxhash64), the
      bitmap ships once per executor as a SparkContext broadcast numpy
      array, and an Arrow-batched UDF does the vectorized bit lookups
      — per-row cost independent of bitmap size.  This is the 100 TB
      path for large build sides (a 100M-key build wants a ~200 MB
      bitmap no array column should carry).

    Both paths: zero shuffle on the probe rows (plan-asserted in
    tests).  ``xxhash64`` is type-sensitive, so the probe and build
    key columns must share a data type; mismatches raise immediately
    rather than silently filtering everything out.
    """
    build_key = build_key or probe_key
    p_type = probe.schema[probe_key].dataType
    b_type = build.schema[build_key].dataType
    if p_type != b_type:
        raise ValueError(
            f"bloom_semi_reduce key types must match (xxhash64 is "
            f"type-sensitive): probe[{probe_key}]={p_type} vs "
            f"build[{build_key}]={b_type}"
        )
    if impl not in ("auto", "column", "arrow"):
        raise ValueError(f"impl must be auto|column|arrow, got {impl!r}")
    if m_bits is None:
        import math

        n_build = build.count()  # bounded: the build side is selective
        m_bits = 1 << max(10, math.ceil(math.log2(16 * n_build + 1)))
    if impl == "auto":
        impl = "column" if m_bits <= _BLOOM_COLUMN_MAX_BITS else "arrow"
    bm = bloom_bitmap(
        build.select(F.col(build_key).alias("__bloom_v")),
        "__bloom_v",
        m_bits,
        k,
    )
    if impl == "column":
        return (
            probe.join(F.broadcast(bm), how="cross")
            .filter(
                bloom_might_contain(
                    F.col(probe_key), F.col("__bf"), m_bits, k
                )
            )
            .drop("__bf")
        )
    # arrow path: bitmap to the driver ONCE (m_bits/8 bytes — the same
    # bound that made it broadcastable), explicit executor broadcast,
    # vectorized lookups; hashing stays JVM-side for build parity
    from pyspark.sql.functions import pandas_udf

    words = np.array(bm.first()["__bf"], dtype=np.int64)
    bcast = probe.sparkSession.sparkContext.broadcast(words)

    @pandas_udf("boolean")
    def _hits(pos: pd.Series) -> pd.Series:
        w = bcast.value
        mat = np.vstack(pos.to_numpy())  # (batch, k) bit positions
        bits = (w[mat >> 6] >> (mat & 63)) & 1
        return pd.Series(bits.all(axis=1))

    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(probe_key), F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )
    return (
        probe.withColumn("__bloom_pos", positions)
        .filter(_hits(F.col("__bloom_pos")))
        .drop("__bloom_pos")
    )


def bloom_reduced_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str] | Column,
    probe_key: str,
    build_key: str | None = None,
    how: str = "inner",
    m_bits: int | None = None,
    k: int = 5,
    impl: str = "auto",
) -> DataFrame:
    """Convenience composition: :func:`bloom_semi_reduce` the probe
    side (auto-sized bitmap by default), then run the real join —
    result-identical to ``probe.join(build, on, how)`` for
    partner-dependent join types (``inner``/``semi``/``right``; NOT
    ``left``/``full``/``anti``, which keep or detect partnerless probe
    rows — rejected)."""
    if how not in ("inner", "semi", "left_semi", "leftsemi", "right"):
        raise ValueError(
            f"bloom reduction only preserves partner-dependent joins, "
            f"not how={how!r}"
        )
    reduced = bloom_semi_reduce(
        probe, build, probe_key, build_key, m_bits, k, impl
    )
    return reduced.join(build, on, how)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    phi: float = 0.001,
    rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Pre-join skew diagnosis: which keys would dominate a shuffle on
    ``key_col``, and how many salt slices each needs.

    Composes the exact-phi heavy-hitters sketch
    (``operators/sketches.heavy_hitters`` — bounded per-partition
    state, candidates broadcast, exact refined counts): every key with
    >= ``phi`` of the rows comes back with its exact count, share, and
    ``salt_factor = ceil(cnt / rows_per_task)`` — the replication
    factor :func:`~sparkall_spark.sources.sinks.salted_join` (or a
    manual salt column) needs so no single reducer sees more than
    ``rows_per_task`` rows of that key.

    Why a sketch and not ``GROUP BY key ORDER BY count DESC LIMIT n``:
    the plain form shuffles O(distinct keys) and sorts; at 100 TB the
    skew probe must be cheaper than the join it is protecting.  Run it
    on a fraction_sample for even less (shares are ratios — they
    survive uniform sampling; counts scale by the fraction).

    Output: ``key`` (string), ``cnt``, ``share``, ``salt_factor`` —
    one row per phi-heavy key.  A key can clear phi yet still fit one
    task (salt_factor 1 = no action needed), so read both columns.
    """
    from sparkall_spark.operators.sketches import heavy_hitters

    if rows_per_task < 1:
        raise ValueError(f"rows_per_task must be >= 1, got {rows_per_task}")
    hh = heavy_hitters(df, key_col, phi=phi)
    return hh.select(
        F.col("item").alias("key"),
        "cnt",
        "share",
        F.ceil(F.col("cnt") / F.lit(float(rows_per_task)))
        .cast("int")
        .alias("salt_factor"),
    )


def semi_reduce_gate(
    probe_sketch: DataFrame,
    build_sketch: DataFrame,
    depth: int,
    probe_rows: int,
    max_match_fraction: float = 0.7,
    width: int | None = None,
    params_probe: dict | None = None,
    params_build: dict | None = None,
) -> tuple[bool, int]:
    """Decide whether :func:`bloom_semi_reduce` is worth scheduling,
    from two PERSISTED CMS counter tables of the join keys (the
    ``corpus_overlap_gate`` discipline: sketches are load-bearing
    planning inputs, not standalone telemetry).

    Returns ``(should_reduce, est_join_rows)``: the reduction is
    skipped when the estimated matched fraction of probe rows exceeds
    ``max_match_fraction`` — a filter that keeps (almost) everything is
    pure overhead.  Because the CMS estimate only OVER-counts
    (structural), a True here is trustworthy: the real matched
    fraction is at most the estimated one, so the reduction sheds at
    least the predicted share.

    Driver-side by design (two bounded sketch frames -> one bigint);
    at 100 TB the sketches come from the daily key-telemetry pass, not
    a fresh scan — building them ad hoc would cost more than the bloom
    filter they gate.

    Pass ``width`` to validate both counter tables' bucket domains,
    and ``params_probe``/``params_build`` (the pinned dicts
    ``load_sketch`` returns) for the full both-directions guarantee —
    a width mismatch silently mis-pairs buckets and voids the
    "True is trustworthy" one-sidedness this gate relies on (the data
    check alone cannot catch a narrower-than-declared sketch).
    """
    from sparkall_spark.operators.sketches import cms_join_cardinality

    if probe_rows <= 0:
        return (False, 0)
    est = cms_join_cardinality(
        probe_sketch, build_sketch, depth, width=width,
        params_a=params_probe, params_b=params_build,
    ).first()["est_join_rows"]
    return (est <= max_match_fraction * probe_rows, int(est))
