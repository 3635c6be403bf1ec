"""Deterministic distinct-cardinality sketches (KMV / k-minimum values).

At 100 TB, "how many distinct X" is a planning primitive, not a query:
vocabulary sizes gate tokenizer training, per-key distinct counts
expose join skew before it burns a shuffle, and cross-corpus overlap
estimates (|crawl A ∩ crawl B|) decide whether a dedup pass is worth
scheduling — all places where an exact COUNT(DISTINCT) (a full
shuffle of every distinct value) is the thing being avoided.

KMV (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07 "On
synopses for distinct value estimation") keeps the k smallest hash
values of the set.  If h_(k) is the k-th smallest of hashes uniform on
[0, M), the set has ≈ (k-1) * M / h_(k) distinct members (relative
error ~1/sqrt(k-2)); with fewer than k distinct hashes the sketch IS
the exact distinct set.  Sketches are mergeable (union = re-rank the
union of the two k-min sets) and support intersection estimation
(Beyer et al. §4: among the k smallest of the merged sketch, the
fraction present in BOTH input sketches estimates the Jaccard of the
sets), so corpus-vs-corpus overlap costs two bounded sketches instead
of a distinct-join.

Unlike ``approx_count_distinct`` (HLL++, whose register layout is
engine-private), every number here is DETERMINISTIC and cross-engine
reproducible: values are hashed with the repo's portable polynomial
hash (``operators/features._portable_token_hash``) pushed through the
two-round LCG mixer (``operators/sampling._mix``) — both mirrored
bit-for-bit in the DuckDB oracles — the k-min set is an ORDER BY /
row_number prefix, and the estimator is one double division, so the
driver's value-hash correctness gate covers the sketch itself, not
just a tolerance band.  (The trade: a 31-bit hash space, so estimates
also count the hash collisions both engines share — documented, and
irrelevant below ~10^7 distinct values.)

Scale shape: ``kmv_sketch`` shuffles O(distinct values) per group (the
map-side-combined ``groupBy(group, hash)``), NOT O(rows), and the
ranked prefix keeps k rows per group; merges and estimates then touch
k-sized arrays only.  A true bounded-state one-pass variant (custom
Aggregator) needs JVM code; the distinct-shuffle form is the honest
PySpark-native shape and is already orders of magnitude under the
exact-count cost whenever values repeat.

No counterpart in the reference engine (its aggregate surface is
SUM/MIN/MAX/AVG/COUNT, `QueryAnalyser.scala` §aggregates); this
extends the beyond-reference training-data telemetry surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkall_spark.operators.features import _P_MOD, _portable_token_hash
from sparkall_spark.operators.sampling import _mix, mix_sql

#: estimator hash domain: the LCG mix output space, 2^31 - 1
_M = 2_147_483_647


def _kmv_hash(value: Column) -> Column:
    """Order-statistics-grade portable hash: the polynomial rolling
    hash gives a collision-resistant equality fingerprint but is NOT
    uniform over its domain for structured keys (shared prefixes with
    short varying suffixes land in narrow bands — measured: a 6,000-key
    'item<N>' set estimated as 844 from raw poly hashes), so the
    repo's two-round LCG mixer (sampling._mix, already SQL-mirrored)
    spreads it over [0, 2^31-1) before the k-min order statistic."""
    return _mix(_portable_token_hash(value), seed=0)


def _estimate(n_distinct: Column, kth: Column, k: int) -> Column:
    """KMV estimator: exact below k, (k-1)*M/h_(k) at k."""
    return F.round(
        F.when(n_distinct < k, n_distinct.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(float(_M)) / kth.cast("double")
        ),
        4,
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group KMV sketch of ``value_col``'s distinct values.

    Output: ``group_cols`` + ``kmv_hashes`` (ascending array<bigint>,
    at most k), ``kmv_k`` (k), ``n_kept`` (|hashes|), ``est_distinct``
    (double, exact when fewer than k distinct hashes exist).

    One map-side-combined distinct aggregation + a TWO-PHASE k-min
    (per-shuffle-partition k smallest, then k smallest of those
    k-sized partials — the same closure property kmv_merge relies on):
    no single task ever sorts a group's full distinct set, which a
    row_number window partitioned only by group would force (all
    distinct hashes of a group — or of the WHOLE input when ungrouped
    — onto one task: the exact COUNT(DISTINCT) bottleneck this sketch
    exists to avoid).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = group_cols or []
    h = _kmv_hash(F.col(value_col).cast("string"))
    distinct = (
        df.select(*groups, h.alias("__h"))
        .filter(F.col(value_col).isNotNull())
        .groupBy(*groups, "__h")
        .agg(F.lit(1))
    )
    partials = (
        distinct.withColumn("__p", F.spark_partition_id())
        .groupBy(*groups, "__p")
        .agg(F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("__hs"))
        .select(*groups, F.explode("__hs").alias("__h"))
    )
    agg = partials.groupBy(*groups).agg(
        F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("kmv_hashes")
    )
    n = F.size("kmv_hashes")
    return agg.select(
        *groups,
        "kmv_hashes",
        F.lit(k).alias("kmv_k"),
        n.alias("n_kept"),
        _estimate(n, F.element_at("kmv_hashes", k), k).alias("est_distinct"),
    )


def _resolve_k(a: DataFrame, b: DataFrame, k: int | None) -> int:
    """The shared k of two sketch tables.  Pass ``k`` explicitly to
    avoid two eager ``.first()`` driver actions that would re-execute
    the (possibly uncached) upstream sketch plans just to read a
    constant the caller usually knows."""
    if k is not None:
        return k
    k_a = a.select("kmv_k").first()["kmv_k"]
    k_b = b.select("kmv_k").first()["kmv_k"]
    if k_a != k_b:
        raise ValueError(f"cannot merge sketches with k={k_a} and k={k_b}")
    return k_a


def kmv_merge(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str] | None = None,
    k: int | None = None,
) -> DataFrame:
    """Union two sketch tables (same k) into the sketch of the UNION of
    the underlying sets — KMV's closure property: the k smallest of
    (k-min(A) ∪ k-min(B)) equal the k smallest of A ∪ B.  Groups
    present on one side only pass through unchanged (full outer)."""
    groups = group_cols or []
    k = _resolve_k(a, b, k)
    sa = a.select(*groups, F.col("kmv_hashes").alias("__ha"))
    sb = b.select(*groups, F.col("kmv_hashes").alias("__hb"))
    empty = F.array().cast("array<bigint>")
    # ungrouped sketches are single rows — including over an EMPTY
    # relation (a global agg emits one row with kmv_hashes=[] and
    # est_distinct=0.0), so the crossJoin below always sees 1×1 rows
    merged = sa.join(sb, groups, "full_outer") if groups else sa.crossJoin(sb)
    union_sorted = F.slice(
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("__ha"), empty),
                    F.coalesce(F.col("__hb"), empty),
                )
            )
        ),
        1,
        k,
    )
    n = F.size("kmv_hashes")
    return merged.withColumn("kmv_hashes", union_sorted).select(
        *groups,
        "kmv_hashes",
        F.lit(k).alias("kmv_k"),
        n.alias("n_kept"),
        _estimate(n, F.element_at("kmv_hashes", k), k).alias("est_distinct"),
    )


def kmv_overlap_estimate(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str] | None = None,
    k: int | None = None,
) -> DataFrame:
    """Jaccard / intersection / union estimates between two sketched
    sets, per group (Beyer et al. SIGMOD'07 §4): rank the merged
    sketch, count how many of its entries occur in BOTH input k-min
    sets; that fraction estimates Jaccard, and scaled by the union
    estimate gives |A ∩ B|.

    Output: ``group_cols`` + ``est_union``, ``jaccard_est``,
    ``est_intersection`` (all double, deterministic).  Groups missing
    on either side estimate zero overlap.
    """
    groups = group_cols or []
    k = _resolve_k(a, b, k)
    sa = a.select(*groups, F.col("kmv_hashes").alias("__ha"))
    sb = b.select(*groups, F.col("kmv_hashes").alias("__hb"))
    merged = (
        sa.join(sb, groups, "full_outer") if groups else sa.crossJoin(sb)
    )
    empty = F.array().cast("array<bigint>")
    ha = F.coalesce(F.col("__ha"), empty)
    hb = F.coalesce(F.col("__hb"), empty)
    union_k = F.slice(F.array_sort(F.array_distinct(F.concat(ha, hb))), 1, k)
    both = F.size(
        F.array_intersect(F.array_intersect("__uk", "__ha2"), "__hb2")
    )
    n_u = F.size("__uk")
    jac = F.round(both.cast("double") / n_u, 6)
    est_union = _estimate(n_u, F.element_at("__uk", k), k)
    return (
        merged.withColumn("__uk", union_k)
        .withColumn("__ha2", ha)
        .withColumn("__hb2", hb)
        .select(
            *groups,
            est_union.alias("est_union"),
            jac.alias("jaccard_est"),
            F.round(jac * est_union, 4).alias("est_intersection"),
        )
    )


def kmv_sketch_sql(
    table: str,
    value_sql: str,
    k: int = 256,
    group_sql: str | None = None,
) -> str:
    """DuckDB mirror of :func:`kmv_sketch` (same hash, same k-min
    prefix, same estimator arithmetic) for oracle-side verification.
    ``value_sql`` is a per-row SQL expression producing the value;
    ``group_sql`` an optional grouping expression aliased ``grp``."""
    g_inner = f"{group_sql} AS grp," if group_sql else ""
    g = "grp," if group_sql else ""
    poly = (
        "list_reduce(list_prepend(0::BIGINT,"
        " [ascii(c)::BIGINT FOR c IN"
        " list_filter(string_split(v, ''), x -> x <> '')]),"
        f" (acc, c) -> (acc * 31 + c) % {_P_MOD})"
    )
    mixed = mix_sql(poly, seed=0)
    return f"""
SELECT {g}
       hs AS kmv_hashes, {k} AS kmv_k, len(hs) AS n_kept,
       round(CASE WHEN len(hs) < {k} THEN len(hs)::DOUBLE
             ELSE ({k} - 1)::DOUBLE * {_M} / hs[{k}] END, 4) AS est_distinct
FROM (
  SELECT {g} list_sort(list(DISTINCT h))[1:{k}] AS hs
  FROM (
    SELECT {g} {mixed} AS h
    FROM (SELECT {g_inner} CAST({value_sql} AS VARCHAR) AS v FROM {table})
    WHERE v IS NOT NULL
  )
  {"GROUP BY grp" if group_sql else ""}
)
"""
