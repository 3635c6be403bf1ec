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

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

from sparkall_spark.operators.features import (
    _P_MOD,
    _portable_token_hash,
    portable_token_hash_sql,
)
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
    # distinct the RAW value first (cheap JVM hash agg, map-side
    # combined), then fold the portable hash once per distinct value —
    # the char-fold is the expensive projection, and running it per
    # OCCURRENCE wastes rows/distinct x the work (~50x on Zipf word
    # streams, measured).  Identical output: same distinct set, same
    # hashes.  Trade: the shuffle carries raw strings instead of
    # 8-byte hashes — for the short keys sketches summarize this is a
    # wash; for long values pre-hash manually before calling.
    distinct = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, F.col(value_col).cast("string").alias("__v"))
        .groupBy(*groups, "__v")
        .agg(F.lit(1))
        .select(*groups, _kmv_hash(F.col("__v")).alias("__h"))
    )
    # the k-min phases dedup at the HASH level (array_distinct before
    # each slice): two distinct VALUES may collide in the 31-bit hash
    # domain, and the sketch is a set of hashes — the SQL mirror's
    # list(DISTINCT h) and kmv_merge's distinct both assume it (review
    # catch: the distinct-first restructure had dropped this)
    partials = (
        distinct.withColumn("__p", F.spark_partition_id())
        .groupBy(*groups, "__p")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.collect_list("__h"))), 1, k
            ).alias("__hs")
        )
        .select(*groups, F.explode("__hs").alias("__h"))
    )
    agg = partials.groupBy(*groups).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.collect_list("__h"))), 1, k
        ).alias("kmv_hashes")
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
    mixed = mix_sql(portable_token_hash_sql("v"), seed=0)
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


# --- heavy hitters (Misra-Gries / frequent items) ---------------------------
#
# KMV answers "how many distinct"; the matching planning primitive is
# "WHICH items dominate" — top domains before a crawl re-balance, hot
# n-grams before tokenizer training, hot dedup keys before a join.  An
# exact answer is a full O(distinct) shuffle; the Misra-Gries summary
# (Misra & Gries '82; merge semantics per Agarwal et al., PODS'12
# "Mergeable summaries") keeps k counters per partition, so only
# <= k rows leave each partition — bounded state AND bounded shuffle,
# a strictly stronger scale shape than the KMV distinct-shuffle form.
#
# Estimates depend on how data met the counters (partition layout),
# so the raw summary is NOT value-hash-gated; its contract is the MG
# GUARANTEE — est <= true <= est + err_bound, and no item with
# frequency > 2N/(k+1) is ever dropped — which tests assert under
# adversarial repartitionings.  The hash-gated surface is
# :func:`heavy_hitters`: MG candidates + one exact refine pass, whose
# output (the true phi-heavy items with exact counts) is
# partition-independent whenever k clears the guarantee bound, which
# the function enforces.


def _mg_reduce(counters: dict, k: int) -> int:
    """Reduce ``counters`` in place to at most ``k`` entries by
    subtracting the (k+1)-th largest count from every counter and
    dropping the non-positive ones (the weighted Misra-Gries step —
    at most k counters can exceed the (k+1)-th largest, so one pass
    suffices).  Returns the decrement applied (0 when already small
    enough); the sum of returned decrements bounds every item's
    undercount."""
    if len(counters) <= k:
        return 0
    m = sorted(counters.values(), reverse=True)[k]
    for item in list(counters):
        c = counters[item] - m
        if c > 0:
            counters[item] = c
        else:
            del counters[item]
    return m


def _mg_update(state: dict, dec: int, items, counts, k: int) -> int:
    """Fold one batch of exact (item, count) pairs into an MG state
    dict; returns the updated total decrement."""
    for item, c in zip(items, counts):
        state[item] = state.get(item, 0) + int(c)
    return dec + _mg_reduce(state, k)


def misra_gries_summary(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group Misra-Gries frequent-items summary of ``value_col``
    (values compared as strings, NULLs dropped — the kmv_sketch
    conventions).

    Output: ``group_cols`` + ``item`` (string), ``est`` (bigint,
    always <= the item's true count), ``err_bound`` (bigint — the
    group's total decrement: true count <= est + err_bound), ``n_rows``
    (bigint, the group's exact non-null row count).  At most ``k``
    items per group; any item with true count > err_bound is
    guaranteed present (so nothing with frequency > 2·n_rows/(k+1)
    is ever missed — per-partition decrements are <= n_p/(k+1) and the
    single merge reduction adds at most n/(k+1)).

    Scale shape: one ``mapInPandas`` pass keeps a k-entry dict per
    group per partition (each Arrow batch folds in via a vectorized
    ``value_counts``) and emits <= k+1 rows per (partition, group);
    the merge aggregates those partials — shuffle volume is
    O(k · partitions · groups), independent of both row count and
    distinct count.  Estimates (not membership above the bound) vary
    with partition layout; hash-gate :func:`heavy_hitters`, not this.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    groups = group_cols or []
    src = df.select(
        *groups, F.col(value_col).cast("string").alias("__v")
    ).filter(F.col(value_col).isNotNull())
    gfields = [src.schema[g] for g in groups]
    out_schema = T.StructType(
        gfields
        + [
            T.StructField("item", T.StringType(), True),
            T.StructField("cnt", T.LongType(), True),
            T.StructField("part_n", T.LongType(), True),
            T.StructField("part_dec", T.LongType(), True),
        ]
    )

    def partials(batches):
        states: dict = {}  # group key tuple -> {item: cnt}
        decs: dict = {}
        ns: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            if groups:
                counted = pdf.groupby(groups, sort=False, dropna=False)[
                    "__v"
                ].value_counts()
                for key, c in counted.items():
                    g = key[:-1]
                    item = key[-1]
                    st = states.setdefault(g, {})
                    st[item] = st.get(item, 0) + int(c)
                    ns[g] = ns.get(g, 0) + int(c)
                for g, st in states.items():
                    decs[g] = decs.get(g, 0) + _mg_reduce(st, k)
            else:
                vc = pdf["__v"].value_counts()
                st = states.setdefault((), {})
                decs[()] = _mg_update(
                    st, decs.get((), 0), vc.index, vc.to_numpy(), k
                )
                ns[()] = ns.get((), 0) + int(vc.to_numpy().sum())
        rows = []
        for g, st in states.items():
            for item, c in st.items():
                rows.append((*g, item, c, None, None))
            rows.append((*g, None, None, ns[g], decs.get(g, 0)))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(rows, columns=cols)

    parts = src.mapInPandas(partials, schema=out_schema)
    totals = (
        parts.filter(F.col("item").isNull())
        .groupBy(*groups)
        .agg(
            F.sum("part_n").cast("bigint").alias("n_rows"),
            F.sum("part_dec").cast("bigint").alias("__pdec"),
        )
    )
    counters = (
        parts.filter(F.col("item").isNotNull())
        .groupBy(*groups, "item")
        .agg(F.sum("cnt").cast("bigint").alias("__c"))
    )
    # merge reduction on the <= k*P*G counter rows (metadata scale):
    # one k+1-bounded collect per group, sorted (count desc, item asc)
    # — the (k+1)-th entry's count is the decrement, survivors are the
    # first k strictly above it.  An AGGREGATE, not a window: the
    # ungrouped case would need a constant window key, which Catalyst
    # constant-folds into an empty partition spec (single-partition
    # WindowExec warning); the agg expresses the same bounded
    # reduction, with map-side partials.
    top = counters.groupBy(*groups).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("__c")).alias("nc"),
                        F.col("item").alias("item"),
                        F.col("__c").alias("c"),
                    )
                )
            ),
            1,
            k + 1,
        ).alias("__top")
    ).withColumn(
        "__m",
        F.when(
            F.size("__top") > k, F.element_at("__top", k + 1)["c"]
        ).otherwise(F.lit(0)),
    )
    mg = top.select(
        *groups,
        "__m",
        F.explode(
            F.filter(
                F.slice("__top", 1, k), lambda s: s["c"] > F.col("__m")
            )
        ).alias("__s"),
    )
    joined = (
        mg.join(totals, groups) if groups else mg.crossJoin(totals)
    )
    return joined.select(
        *groups,
        F.col("__s.item").alias("item"),
        (F.col("__s.c") - F.col("__m")).cast("bigint").alias("est"),
        (F.col("__pdec") + F.col("__m")).cast("bigint").alias("err_bound"),
        "n_rows",
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    phi: float,
    k: int | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters via a bounded-state candidate pass: every
    item whose frequency is >= ``phi`` of its group's (non-null) rows,
    with EXACT count and share.

    Two passes, both scale-shaped: (1) :func:`misra_gries_summary`
    produces <= k candidates per group with bounded per-partition state
    and O(k·partitions) shuffle; (2) the candidate list (tiny —
    broadcast) semi-joins the corpus and only candidate rows are
    counted exactly.  Because MG never drops an item with frequency
    > 2n/(k+1), choosing k so that phi > 2/(k+1) makes the candidate
    set a superset of the true heavy hitters REGARDLESS of partition
    layout — so the refined output is deterministic and value-hash
    gateable (the driver leg's oracle is a plain GROUP BY .. HAVING).

    Output: ``group_cols`` + ``item``, ``cnt`` (bigint, exact),
    ``share`` (double, 6dp).  Default ``k = 2*ceil(1/phi)+1`` (one
    doubling of margin over the guarantee bound); an explicit k below
    the bound raises.
    """
    import math

    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    need = 2.0 / phi - 1.0  # k must satisfy phi > 2/(k+1)
    if k is None:
        k = 2 * math.ceil(1.0 / phi) + 1
    elif k <= need:
        raise ValueError(
            f"k={k} cannot guarantee phi={phi} heavy hitters survive the "
            f"sketch (needs k > {need:.1f}); raise k or lower phi"
        )
    from sparkall_spark.operators._cache import persist_tracked

    groups = group_cols or []
    # persisted (k-bounded rows): BOTH consumers below — the candidate
    # list and the exact per-group totals — branch from the summary,
    # and an uncached plan would run the corpus MG pass once per branch
    summ = persist_tracked(misra_gries_summary(df, value_col, k, group_cols))
    cands = summ.select(*groups, "item")
    n_rows = summ.select(*groups, "n_rows").distinct()
    base = df.select(
        *groups, F.col(value_col).cast("string").alias("item")
    ).filter(F.col(value_col).isNotNull())
    refined = base.join(F.broadcast(cands), [*groups, "item"]).groupBy(
        *groups, "item"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    out = (
        refined.join(n_rows, groups)
        if groups
        else refined.crossJoin(n_rows)
    )
    return out.filter(
        F.col("cnt").cast("double")
        >= F.lit(float(phi)) * F.col("n_rows").cast("double")
    ).select(
        *groups,
        "item",
        "cnt",
        F.round(
            F.col("cnt").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("share"),
    )


# --- bottom-k sampled quantiles ----------------------------------------------
#
# The third member of the sketch family (KMV: how many distinct; MG:
# which items dominate; this: how values are DISTRIBUTED).  Spark's
# percentile_approx answers it with a GK sketch whose merge layout is
# engine-private; this keeps the rows whose KEY hashes smallest — a
# bottom-k order sample (Cohen & Kaplan, "Summarizing data using
# bottom-k sketches", PODC'07) — which is a uniform without-replacement
# sample of size k that is DETERMINISTIC (portable hash chain),
# MERGEABLE (k-min closure: the k smallest of two bottom-k sets are the
# k smallest of the union), layout-independent, and mirrorable
# bit-for-bit in SQL.  Exact interpolated quantiles over the sample
# then estimate the population quantiles with the standard DKW bound
# sup|F_k - F| <= sqrt(ln(2/d)/(2k)).


def bottomk_sample(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Per-group bottom-k sample of ``value_col``: the values of the k
    rows whose ``key_col`` hash (portable poly hash -> LCG mix, the KMV
    chain) ranks smallest.  Output: ``group_cols`` + ``sample_hv``
    (array<struct<h:bigint, v:double>>, ascending by (h, v)),
    ``n_kept``, ``n_rows`` (exact non-null row count — the count rides
    the same aggregation for free).

    Sampling on the KEY, not the value: duplicate values keep
    independent inclusion chances, so the sample is row-uniform.
    NULL values/keys are dropped (the sketch conventions).  Two-phase
    k-min like ``kmv_sketch`` — per-partition k smallest, then k
    smallest of the partials — so no task ever sorts a group's full
    row set; per-partition output is k structs + one count.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    groups = group_cols or []
    h = _mix(_portable_token_hash(F.col(key_col).cast("string")), seed)
    rows = df.filter(
        F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        *groups,
        F.struct(
            h.alias("h"), F.col(value_col).cast("double").alias("v")
        ).alias("__hv"),
    )
    partials = (
        rows.withColumn("__p", F.spark_partition_id())
        .groupBy(*groups, "__p")
        .agg(
            F.slice(F.array_sort(F.collect_list("__hv")), 1, k).alias("__hvs"),
            F.count(F.lit(1)).cast("bigint").alias("__n"),
        )
    )
    return partials.groupBy(*groups).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__hvs"))), 1, k
        ).alias("sample_hv"),
        F.size(
            F.slice(F.array_sort(F.flatten(F.collect_list("__hvs"))), 1, k)
        ).alias("n_kept"),
        F.sum("__n").cast("bigint").alias("n_rows"),
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    probs: list[float],
    k: int = 256,
    group_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic quantile estimates from a bottom-k sample: exact
    interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, the repo's established mirror pair) over the
    sampled values, 6dp rounded.

    Output: ``group_cols`` + one row per prob — ``prob`` (double),
    ``quantile_est`` (double), ``n_sampled`` (bigint).  Exact when the
    group has <= k rows (the sample IS the group).  Unlike
    ``percentile_approx`` the result is identical on any engine with
    the same hash chain and on any partition layout — so a correctness
    gate can hash it, and two corpora's sketches merge losslessly
    (k-min closure) before quantiling.
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    if any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0, 1], got {probs}")
    groups = group_cols or []
    s = bottomk_sample(df, value_col, key_col, k, group_cols, seed)
    vals = s.select(
        *groups,
        F.col("n_kept").cast("bigint").alias("n_sampled"),
        F.explode(F.col("sample_hv.v")).alias("__v"),
    )
    agg = vals.groupBy(*groups, "n_sampled").agg(
        F.percentile(
            "__v", F.array(*[F.lit(float(p)) for p in probs])
        ).alias("__qs")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in probs]).alias("prob"),
        F.col("__qs").alias("q"),
    )
    return agg.select(
        *groups,
        "n_sampled",
        F.explode(pairs).alias("__pq"),
    ).select(
        *groups,
        F.col("__pq.prob").alias("prob"),
        F.round(F.col("__pq.q"), 6).alias("quantile_est"),
        "n_sampled",
    )


def bottomk_merge(
    a: DataFrame,
    b: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union two bottom-k sample tables (same k, same key hash chain)
    into the bottom-k sample of the UNION of the underlying row sets —
    the k-min closure property, same shape as :func:`kmv_merge`.
    ``n_rows`` adds (the inputs must be disjoint row sets, as in any
    shard-then-merge plan)."""
    groups = group_cols or []
    sa = a.select(
        *groups,
        F.col("sample_hv").alias("__ha"),
        F.col("n_rows").alias("__na"),
    )
    sb = b.select(
        *groups,
        F.col("sample_hv").alias("__hb"),
        F.col("n_rows").alias("__nb"),
    )
    merged = (
        sa.join(sb, groups, "full_outer") if groups else sa.crossJoin(sb)
    )
    empty = F.array().cast("array<struct<h:bigint,v:double>>")
    union_k = F.slice(
        F.array_sort(
            F.concat(
                F.coalesce(F.col("__ha"), empty),
                F.coalesce(F.col("__hb"), empty),
            )
        ),
        1,
        k,
    )
    return merged.select(
        *groups,
        union_k.alias("sample_hv"),
        F.size(union_k).alias("n_kept"),
        (
            F.coalesce(F.col("__na"), F.lit(0))
            + F.coalesce(F.col("__nb"), F.lit(0))
        ).cast("bigint").alias("n_rows"),
    )


# --- Count-Min sketch (point-frequency estimation) ---------------------------
#
# The third planning sketch: KMV answers "how many distinct", Misra-
# Gries answers "which items dominate"; Count-Min (Cormode &
# Muthukrishnan, J.Alg'05 "An improved data stream summary") answers
# "roughly how often does THIS item occur" for ANY queried item — how
# many documents per domain before scheduling a per-host recrawl, how
# often a candidate stop-gram fires, how hot a specific join key is —
# in depth*width longs of state, whatever the item universe size.
#
# Structure: depth rows of width counters; row d adds each occurrence
# to counter hash_d(item) % width; the point estimate is the MINIMUM of
# an item's depth counters.  Two properties are STRUCTURAL (they hold
# for any hash choice, so tests assert them unconditionally):
#   - est >= true count (counters only ever over-count), and
#   - est == true when no colliding item shares all of the item's
#     buckets (e.g. whenever the row's buckets are collision-free).
# The classic eps = e/width error bound assumes pairwise-independent
# hashing; the repo's portable chain (poly hash -> two-LCG-round mix,
# one seed per row) is not formally pairwise independent, so — as with
# the MG summary — the bound is asserted EMPIRICALLY in tests, not
# claimed analytically.  What the chain buys instead is determinism:
# the whole counter table is a pure function of the input multiset
# (layout-independent by commutativity of +), reproduced bit-for-bit
# by the DuckDB mirror, so the driver's value-hash gate covers the
# sketch itself.
#
# Scale shape: the build explodes each row into depth (row, bucket)
# tuples, but the map-side combiner collapses every partition to at
# most depth*width partials — the shuffle is O(depth*width) per
# partition, NOT O(rows).  Merging two sketches is elementwise sum
# (linearity), so shard-then-merge and stream-then-merge are exact,
# and the streaming twin (streaming/stateful.cms_stream) is Spark's
# own incremental groupBy aggregation over the same bounded key domain.

#: per-row seed schedule for the CMS hash family — row d mixes with
#: seed d*_CMS_ROW_STRIDE + _CMS_ROW_SALT (mirrored in cms_*_sql)
_CMS_ROW_STRIDE = 1_000_003
_CMS_ROW_SALT = 12_289


def cms_bucket_array(value: Column, depth: int, width: int) -> Column:
    """array<int> of the value's ``depth`` bucket indexes — bucket d is
    the portable hash mixed with row-d's seed, mod ``width``.  Shared
    by the batch build, the query side, and the streaming twin so all
    three address the same counters."""
    h = _portable_token_hash(value)
    return F.array(
        *[
            (
                _mix(h, seed=d * _CMS_ROW_STRIDE + _CMS_ROW_SALT)
                % width
            ).cast("int")
            for d in range(depth)
        ]
    )


def _cms_bucket_sql(value_sql: str, d: int, width: int) -> str:
    mixed = mix_sql(
        portable_token_hash_sql(value_sql),
        seed=d * _CMS_ROW_STRIDE + _CMS_ROW_SALT,
    )
    return f"(({mixed}) % {width})"


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
    group_cols: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sparse counter table: one row per non-zero counter,
    ``group_cols`` + ``d`` (int, the hash row), ``bucket`` (int),
    ``cnt`` (bigint).  Absent (d, bucket) combinations are zero.
    ``weight_col`` switches from occurrence counting to weighted sums
    (e.g. byte volume per domain).  NULL values are dropped (sketch
    convention); NULL weights count as zero.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    groups = group_cols or []
    v = F.col(value_col).cast("string")
    w = (
        F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0))
        if weight_col
        else F.lit(1).cast("bigint")
    )
    # pre-aggregate per distinct value FIRST (JVM hash agg), then fold
    # the portable hash + explode buckets once per distinct value with
    # the count as weight — exact by CMS linearity, and the expensive
    # char-fold runs distinct times instead of row times (the
    # kmv_sketch lesson)
    counted = (
        df.filter(v.isNotNull())
        .select(*groups, v.alias("__v"), w.alias("__w0"))
        .groupBy(*groups, "__v")
        .agg(F.sum("__w0").cast("bigint").alias("__w"))
    )
    rows = counted.select(
        *groups,
        F.posexplode(
            cms_bucket_array(F.col("__v"), depth, width)
        ).alias("d", "bucket"),
        F.col("__w"),
    )
    return rows.groupBy(*groups, "d", "bucket").agg(
        F.sum("__w").cast("bigint").alias("cnt")
    )


def cms_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Elementwise sum of two counter tables (same depth/width/hash
    chain): by linearity this IS the sketch of the concatenated
    inputs — exact, not approximate-on-approximate."""
    groups = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*groups, "d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
    group_cols: list[str] | None = None,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """Point-frequency estimates for each probe item: ``group_cols`` +
    ``item_col`` + ``est`` (bigint, min over the item's depth
    counters; missing counters read as 0, so a never-seen item with
    any untouched bucket estimates exactly 0).

    ``depth``/``width`` must match the build call.  One output row PER
    PROBE ROW — including NULL items, which estimate as NULL (never
    silently dropped) — so the estimate can be attached to a
    corpus-scale frame without losing rows.  The min-over-depth is computed
    WITHOUT exploding or re-grouping the probes: the item's depth
    buckets stay in one row and each hash row of the sketch (at most
    ``width`` counters) joins in separately — with ``broadcast_sketch``
    (default) that is ``depth`` chained broadcast hash joins, i.e. a
    fully map-only lookup: scoring a billion probe rows against a
    fixed sketch never shuffles the probes.
    """
    groups = group_cols or []
    v = F.col(item_col).cast("string")
    # NULL items KEEP their row (the per-probe-row contract) and
    # estimate as NULL — their NULL bucket keys match nothing in the
    # joins, and the final when() masks the would-be 0
    out = items.withColumn("__cms_b", cms_bucket_array(v, depth, width))
    for d in range(depth):
        renames = {g: f"__g{d}_{i}" for i, g in enumerate(groups)}
        sd = sketch.filter(F.col("d") == d).select(
            *[F.col(g).alias(renames[g]) for g in groups],
            F.col("bucket").alias(f"__k{d}"),
            F.col("cnt").alias(f"__c{d}"),
        )
        if broadcast_sketch:
            sd = F.broadcast(sd)
        cond = F.col("__cms_b")[d] == F.col(f"__k{d}")
        for g in groups:
            cond = cond & (F.col(g) == F.col(renames[g]))
        out = out.join(sd, on=cond, how="left").drop(
            f"__k{d}", *renames.values()
        )
    counters = [
        F.coalesce(F.col(f"__c{d}"), F.lit(0)) for d in range(depth)
    ]
    # F.least needs >= 2 args; depth == 1 is the single counter itself
    est = F.when(
        v.isNotNull(),
        (F.least(*counters) if depth > 1 else counters[0]).cast("bigint"),
    )
    return out.withColumn("est", est).drop(
        "__cms_b", *[f"__c{d}" for d in range(depth)]
    )


def cms_sketch_sql(
    table: str,
    value_sql: str,
    depth: int = 4,
    width: int = 2048,
    group_sql: str | None = None,
    weight_sql: str = "1",
) -> str:
    """DuckDB mirror of :func:`cms_sketch` (same hash family, same
    seeds, same widths) — a UNION ALL branch per hash row, then the
    shared GROUP BY.  ``group_sql`` is aliased ``grp``."""
    g_inner = f"{group_sql} AS grp," if group_sql else ""
    g = "grp," if group_sql else ""
    base = (
        f"SELECT {g_inner} CAST({value_sql} AS VARCHAR) AS v,"
        f" COALESCE(CAST({weight_sql} AS BIGINT), 0) AS w FROM {table}"
    )
    branches = " UNION ALL ".join(
        f"SELECT {g} {d} AS d, {_cms_bucket_sql('v', d, width)} AS bucket, w"
        f" FROM base WHERE v IS NOT NULL"
        for d in range(depth)
    )
    return f"""
WITH base AS ({base})
SELECT {g} d, bucket, SUM(w)::BIGINT AS cnt
FROM ({branches})
GROUP BY {g} d, bucket
"""


def cms_join_cardinality(
    a: DataFrame,
    b: DataFrame,
    depth: int,
    width: int | None = None,
    params_a: dict | None = None,
    params_b: dict | None = None,
) -> DataFrame:
    """Estimate |A JOIN B| on the sketched key from two counter tables
    (same depth/width/hash family): the classic CMS inner-product
    estimate (Cormode & Muthukrishnan §4.2) — for each hash row d,
    ``sum_bucket cntA[d,b] * cntB[d,b]`` over-counts the true join size
    ``sum_v fA(v) * fB(v)`` by exactly the colliding cross-terms, so
    the MINIMUM over rows is a one-sided estimate:

        true |A JOIN B|  <=  est  (structural, any hash)

    with expected slack ~|A||B|/width per row.  Planning use: decide
    broadcast vs shuffle vs :func:`~sparkall_spark.operators.joins.
    bloom_semi_reduce` BEFORE paying the join — two bounded sketches
    (built once, mergeable, reusable across days) replace a trial
    join.  Output: one row, ``est_join_rows`` (double — the products
    are widened before summing; int64 wraps silently at corpus scale).

    Deterministic like everything here: the estimate is a pure
    function of the two counter tables, so it mirrors in SQL
    (join on (d, bucket), SUM products, MIN over d).

    ``width``: pass the width both sketches were built with to VALIDATE
    the bucket domains — two sketches built with different widths join
    on incompatible bucket ids and produce a meaningless estimate that
    is no longer one-sided.  With ``width`` given, a sketch whose max
    bucket falls outside ``[0, width)`` or whose hash rows don't span
    exactly ``0..depth-1`` raises instead.  (One bounded-frame ``agg``
    per side, driver-side like the estimate itself.)  This data check
    is ONE-SIDED: it catches a sketch built WIDER than declared (its
    buckets overflow the domain) but cannot catch a NARROWER one (its
    buckets fit trivially) — for the full guarantee, pass
    ``params_a``/``params_b`` (the pinned dicts :func:`load_sketch`
    returns): their ``depth``/``width`` are then required to equal the
    declared values exactly, on both sides — and each other, even when
    ``width`` itself is omitted (two sketches pinned at different
    widths never pass).
    """
    if params_a is not None and params_b is not None:
        # even with no declared width, two pinned sketches must agree
        # WITH EACH OTHER — a's width vs b's width is exactly the
        # mis-pairing the validation exists to catch (r10 advice)
        wa, wb = params_a.get("width"), params_b.get("width")
        if wa is not None and wb is not None and int(wa) != int(wb):
            raise ValueError(
                f"cms_join_cardinality: sketch a pins width={wa}, "
                f"sketch b pins width={wb} — buckets would silently "
                "mis-pair"
            )
        da, db = params_a.get("depth"), params_b.get("depth")
        if da is not None and db is not None and int(da) != int(db):
            raise ValueError(
                f"cms_join_cardinality: sketch a pins depth={da}, "
                f"sketch b pins depth={db} — hash rows would not align"
            )
    for side, params in (("a", params_a), ("b", params_b)):
        if params is None:
            continue
        if width is not None and int(params.get("width", width)) != width:
            raise ValueError(
                f"cms_join_cardinality: sketch {side} pins "
                f"width={params['width']}, declared width {width}"
            )
        if int(params.get("depth", depth)) != depth:
            raise ValueError(
                f"cms_join_cardinality: sketch {side} pins "
                f"depth={params['depth']}, declared depth {depth}"
            )
    if width is not None:
        if width < 1:
            raise ValueError(f"width must be >= 1, got {width}")
        # both sides' domain probes ride ONE job (tagged union + one
        # grouped agg) — on sketch-sized frames the cost is pure stage
        # scheduling, and the planning gate runs this in-path every
        # round (r12: was two .first() jobs)
        doms = {
            r["__s"]: r
            for r in (
                a.select(F.lit("a").alias("__s"), "bucket", "d")
                .unionByName(
                    b.select(F.lit("b").alias("__s"), "bucket", "d")
                )
                .groupBy("__s")
                .agg(F.max("bucket").alias("mb"), F.max("d").alias("md"))
                .collect()
            )
        }
        for side in ("a", "b"):
            dom = doms.get(side)  # an empty sketch groups to no row
            if dom is not None and dom["mb"] is not None \
                    and dom["mb"] >= width:
                raise ValueError(
                    f"cms_join_cardinality: sketch {side} has bucket "
                    f"{dom['mb']} >= declared width {width} — built with "
                    "a different width; buckets would silently mis-pair"
                )
            if dom is not None and dom["md"] is not None \
                    and dom["md"] != depth - 1:
                raise ValueError(
                    f"cms_join_cardinality: sketch {side} has hash rows "
                    f"0..{dom['md']} but declared depth {depth} — "
                    "depth mismatch breaks the min-over-rows bound"
                )
    sa = a.select("d", "bucket", F.col("cnt").alias("__ca"))
    sb = b.select("d", "bucket", F.col("cnt").alias("__cb"))
    per_row = (
        sa.join(sb, ["d", "bucket"])  # absent counters are 0: inner is exact
        .groupBy("d")
        # widen BEFORE multiplying: long*long wraps silently at corpus
        # scale (two ~1e12-row inputs overflow one hot product); the
        # estimate is approximate anyway, so double is the right type
        .agg(
            F.sum(
                F.col("__ca").cast("double") * F.col("__cb").cast("double")
            ).alias("__ip")
        )
    )
    # a row with NO shared buckets has inner product 0 — min must see
    # it, so densify over the declared depth
    rows = per_row.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("d")
    )
    return (
        rows.join(per_row, "d", "left")
        .agg(
            F.min(F.coalesce(F.col("__ip"), F.lit(0.0))).alias(
                "est_join_rows"
            )
        )
    )


# --- sketch persistence with parameter pinning --------------------------------
#
# Every sketch here is only mergeable/queryable against a sketch built
# with the SAME parameters (k; depth/width and the per-row seed
# schedule; MG's k) — the docstrings warn that a mismatch silently
# breaks semantics.  Persisted sketches therefore carry their
# parameters in a ``_meta`` side table (the save_postings convention),
# and the loader VALIDATES instead of trusting the caller's memory:
# the failure mode changes from wrong-numbers-downstream to a
# ValueError at load/merge time.

_SKETCH_META_SUBDIR = "_meta"

#: sketch kind -> the parameter names pinned in its _meta row
_SKETCH_PARAMS = {
    "kmv": ("k",),
    "cms": ("depth", "width"),
    "bottomk": ("k", "seed"),
}


def save_sketch(
    sketch: DataFrame, path: str, kind: str, **params: int
) -> None:
    """Persist a sketch table plus its pinned parameters.

    ``kind`` is ``"kmv"`` / ``"cms"`` / ``"bottomk"``; ``params`` must
    provide exactly that kind's parameter set (e.g. ``k=256`` for kmv,
    ``depth=4, width=2048`` for cms).  The rows go to ``path``, the
    parameters to ``path/_meta`` (hidden from a scan of ``path``)."""
    if kind not in _SKETCH_PARAMS:
        raise ValueError(f"unknown sketch kind {kind!r}")
    needed = _SKETCH_PARAMS[kind]
    if set(params) != set(needed):
        raise ValueError(
            f"{kind} sketches pin exactly {needed}, got {tuple(params)}"
        )
    sketch.write.mode("overwrite").parquet(path)
    spark = sketch.sparkSession
    meta = spark.createDataFrame(
        [(kind, *[int(params[p]) for p in needed])],
        "kind string, " + ", ".join(f"{p} bigint" for p in needed),
    )
    meta.write.mode("overwrite").parquet(f"{path}/{_SKETCH_META_SUBDIR}")


def load_sketch(
    spark, path: str, kind: str, **expected: int
) -> tuple[DataFrame, dict]:
    """Load a persisted sketch, validating its kind and (optionally)
    its parameters.  Returns ``(rows, params)``.

    Pass the parameters you are about to merge/query with (e.g.
    ``load_sketch(spark, p, "cms", depth=4, width=2048)``): a mismatch
    raises with both sides named, instead of silently mis-addressing
    counters or merging incompatible k-min sets.  Omit them to just
    read the pinned values back."""
    meta = spark.read.parquet(f"{path}/{_SKETCH_META_SUBDIR}").first()
    if meta["kind"] != kind:
        raise ValueError(
            f"sketch at {path} is kind {meta['kind']!r}, expected {kind!r}"
        )
    params = {p: int(meta[p]) for p in _SKETCH_PARAMS[kind]}
    for name, want in expected.items():
        if name not in params:
            raise ValueError(f"{kind} sketches do not pin {name!r}")
        if params[name] != want:
            raise ValueError(
                f"sketch at {path} pins {name}={params[name]}, caller "
                f"expected {name}={want} — rebuild or re-parameterize"
            )
    return spark.read.parquet(path), params


def save_sketches(
    sketches: "dict[str, tuple[DataFrame, dict]]", path: str, kind: str
) -> None:
    """Persist SEVERAL same-kind sketches under one directory in ONE
    rows write + ONE (tiny) meta write — the batched lifecycle for
    planning gates that persist a sketch pair every run (r12, VERDICT
    r11 Next #2: per-sketch :func:`save_sketch` cost 2 jobs each, so a
    two-sketch gate paid ~4 write jobs of pure stage scheduling).

    ``sketches`` maps name -> (rows, params); every entry must be the
    declared ``kind`` (same schema — that is what makes the single
    tagged-union write possible).  Rows land at ``path`` with a
    ``__sketch`` tag column; per-name parameters at ``path/_meta``.
    Load the set back with :func:`load_sketches`."""
    if kind not in _SKETCH_PARAMS:
        raise ValueError(f"unknown sketch kind {kind!r}")
    if not sketches:
        raise ValueError("save_sketches: empty sketch set")
    needed = _SKETCH_PARAMS[kind]
    frames = []
    meta_rows = []
    for name, (rows, params) in sketches.items():
        if set(params) != set(needed):
            raise ValueError(
                f"{kind} sketches pin exactly {needed}, got "
                f"{tuple(params)} for {name!r}"
            )
        frames.append(rows.withColumn("__sketch", F.lit(name)))
        meta_rows.append((name, kind, *[int(params[p]) for p in needed]))
    union = frames[0]
    for fr in frames[1:]:
        union = union.unionByName(fr)
    union.write.mode("overwrite").parquet(path)
    spark = union.sparkSession
    meta = spark.createDataFrame(
        meta_rows,
        "name string, kind string, "
        + ", ".join(f"{p} bigint" for p in needed),
    )
    meta.write.mode("overwrite").parquet(f"{path}/{_SKETCH_META_SUBDIR}")


def load_sketches(
    spark, path: str, kind: str
) -> "dict[str, tuple[DataFrame, dict]]":
    """Load a :func:`save_sketches` directory: ONE meta read validates
    every sketch's kind and returns its pinned params; the rows come
    off ONE shared lazy parquet scan, sliced per name by the
    ``__sketch`` tag (partition-pruning-free on sketch-sized data —
    the point is one read job, not file pruning).  Returns
    name -> (rows, params) with the tag column dropped — the same
    shape per entry as :func:`load_sketch`, pinned dicts ready for
    ``cms_join_cardinality``-style validation."""
    metas = spark.read.parquet(f"{path}/{_SKETCH_META_SUBDIR}").collect()
    if not metas:
        raise ValueError(f"no sketch metadata at {path}")
    rows = spark.read.parquet(path)
    out = {}
    for m in metas:
        if m["kind"] != kind:
            raise ValueError(
                f"sketch {m['name']!r} at {path} is kind "
                f"{m['kind']!r}, expected {kind!r}"
            )
        params = {p: int(m[p]) for p in _SKETCH_PARAMS[kind]}
        out[m["name"]] = (
            rows.filter(F.col("__sketch") == m["name"]).drop("__sketch"),
            params,
        )
    return out
