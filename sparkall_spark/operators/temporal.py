"""Temporal relational operators Spark lacks natively: as-of join and
range (interval) join.  (Extension — no reference analog; designed for
the 100 TB event-stream case.)

As-of join strategy: instead of a per-row backward lookup (which a
naive implementation does with a range join + window over an exploded
product), tag and UNION the two inputs, then run ONE window pass
partitioned by the equi-keys and ordered by time, carrying the most
recent right-side values forward with ``last_value(ignorenulls)``.
Cost: a single shuffle of |left|+|right| rows — no pair blowup, skew
bounded by the key distribution (same as any keyed window).

Range join strategy: bucket both sides by interval-sized buckets and
equi-join on (key, bucket), letting each row probe the buckets its
interval overlaps — turns an O(n*m) theta join into a bucketed
equi-join (the same trick Spark's own range-join hints apply).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    strict: bool = True,
    how: str = "inner",
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts < left.ts`` (strict) or ``<=`` (not strict), matching on
    the equi-keys ``on``.

    Output: all left columns + ``prefix``-prefixed right value columns.
    ``how='inner'`` drops left rows with no prior right row;
    ``how='left'`` keeps them with nulls (DuckDB's ASOF JOIN default is
    inner — the oracle-aligned mode).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]

    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    # __r_match: explicit match marker forward-filled alongside the value
    # columns — inner-mode match detection must NOT test value-column
    # nullness (a matched right row whose selected values are all NULL is
    # still a match, and right_cols=[] must still filter; DuckDB ASOF
    # JOIN semantics)
    rt = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).withColumn("__is_left", F.lit(0)).withColumn("__r_match", F.lit(1))

    # at equal timestamps: strict -> left sorts first (right row not yet
    # visible); inclusive -> right sorts first
    prio = (
        F.when(F.col("__is_left") == 1, F.lit(0)).otherwise(F.lit(1))
        if strict
        else F.when(F.col("__is_left") == 1, F.lit(1)).otherwise(F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True).withColumn("__prio", prio)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__prio").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        merged = merged.withColumn(
            f"{prefix}{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    merged = merged.withColumn(
        "__matched", F.last(F.col("__r_match"), ignorenulls=True).over(w)
    )

    out = merged.filter(F.col("__is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("__matched").isNotNull())
    return out.drop(
        "__t",
        "__is_left",
        "__prio",
        "__r_match",
        "__matched",
        *[f"__r_{c}" for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    point: str,
    range_start: str,
    range_end: str,
    bucket: Column | str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join left points into right intervals: ``start <= point < end``
    with equi-keys ``on`` — bucketed so it never degenerates into a
    cartesian theta join.

    Each right interval is exploded into the buckets it spans; left
    points hash to one bucket; the join is an equi-join on
    (keys, bucket) followed by the exact interval predicate.
    """
    b = F.lit(bucket_seconds)
    lb = left.withColumn(
        "__bkt", (F.unix_timestamp(F.col(point)) / b).cast("bigint")
    )
    rb = right.withColumn(
        "__bkts",
        F.sequence(
            (F.unix_timestamp(F.col(range_start)) / b).cast("bigint"),
            (F.unix_timestamp(F.col(range_end)) / b).cast("bigint"),
        ),
    ).withColumn("__bkt", F.explode("__bkts")).drop("__bkts")
    joined = lb.join(rb, on + ["__bkt"])
    return joined.filter(
        (F.col(range_start) <= F.col(point)) & (F.col(point) < F.col(range_end))
    ).drop("__bkt")
