"""Sinks + physical-layout helpers.

The reference's only sink is the console (take(20) + count,
SparkExecutor.scala:543-556) plus ad-hoc writers in its eval loader
(Loader.scala:41,87,118,155).  Here the writers carry the layout
decisions that matter at 100 TB:

- :func:`write_partitioned` — hive-style partition directories so
  downstream queries prune partitions at the scan;
- :func:`write_bucketed` — pre-shuffled bucket layout so repeated joins
  or aggregations on the bucket key skip their exchange entirely;
- :func:`salted_join` — explicit skew-salting for keys AQE can't save
  (e.g. one hot key dominating a partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def show_console(df: DataFrame, n: int = 20) -> int:
    """Reference console sink minus its double execution: one persist
    serves both the preview rows and the count."""
    df.persist()
    try:
        df.show(n, truncate=False)
        return df.count()
    finally:
        df.unpersist()


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Partition-pruned layout: one directory per partition value.
    Queries filtering on ``partition_cols`` show PartitionFilters in
    their scan instead of reading everything."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) at
    write time, so a join or groupBy on those columns needs NO exchange
    (Catalyst sees the bucketing and drops the shuffle).  Worth it for
    fact tables joined repeatedly on the same key."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with a salted key: the (small) right side is replicated
    ``salt`` times, the left side picks a random-but-deterministic salt
    per row, so one hot key spreads over ``salt`` reducers.

    Use when a single key dominates (AQE's skew split handles partition
    skew, not single-key hotspots inside one partition of a
    shuffle-hash join).  Deterministic: the salt is hash(whole row) mod
    salt, not rand().
    """
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l2 = left.withColumn("__salt", lsalt)
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l2.join(r2, [key, "__salt"], how)
    return out.drop("__salt")


def zorder_bucket(
    col: Column | str, cmin: float, cmax: float, bits: int
) -> Column:
    """Rank-normalize a numeric column into ``[0, 2^bits)`` against the
    given [cmin, cmax] range — the per-dimension quantization step of
    the Z-order key.  Degenerate or unknown (None) ranges map the whole
    column to 0; per-row NULL values map to bucket 0."""
    c = F.col(col) if isinstance(col, str) else col
    # None bounds (empty input or all-NULL column) and degenerate
    # ranges both collapse to bucket 0; per-row NULL values also land
    # in bucket 0 so a NULL never poisons the whole interleaved key
    if cmin is None or cmax is None or cmax <= cmin:
        return F.lit(0).cast("bigint")
    top = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(float(cmin))) / F.lit(
        float(cmax - cmin)
    ) * F.lit(float(top))
    return F.coalesce(
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(F.lit(top).cast("bigint"), F.floor(scaled).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
    )


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each
    (already bucketed, non-negative) column — bit i of column j lands
    at key position ``i*n_cols + j``.  Rows close in the key are close
    in EVERY dimension, which is what makes min/max stats tight on all
    of them at once.  Pure 64-bit shift/mask arithmetic, so the key is
    engine-portable (:func:`zorder_key_sql`)."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*n_cols must fit a bigint, got {bits}*{n}")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(
                F.lit(1).cast("bigint")
            )
            key = key + F.shiftleft(bit, i * n + j)
    return key


def zorder_key_sql(cols_sql: list[str], bits: int = 16) -> str:
    """ANSI-SQL rendering of :func:`zorder_key` for oracle checks."""
    n = len(cols_sql)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols_sql)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: rows are range-partitioned and
    sorted by the Morton interleave of the named numeric columns, so
    every file/row-group's min/max footer stats are tight in ALL the
    named dimensions at once — parquet readers (Spark's row-group
    filter, DuckDB zone maps) then skip most of a 100 TB table for a
    selective predicate on ANY of them, where a linear sort helps only
    its leading column.

    One bounded aggregation reads the per-column min/max (2*n_cols
    numbers to the driver — metadata scale); quantization then uses
    that fixed range, so the key is deterministic given the data.
    ``repartitionByRange`` on the key gives non-overlapping key ranges
    per file (the property that makes file-level stats disjoint);
    ``sortWithinPartitions`` tightens row groups inside each file.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__mn{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__mx{i}") for i, c in enumerate(cols)],
    ).first()
    buckets = [
        zorder_bucket(c, stats[f"__mn{i}"], stats[f"__mx{i}"], bits)
        for i, c in enumerate(cols)
    ]
    keyed = df.withColumn("__zkey", zorder_key(buckets, bits))
    parted = (
        keyed.repartitionByRange(n_files, "__zkey")
        if n_files
        else keyed.repartitionByRange("__zkey")
    )
    parted.sortWithinPartitions("__zkey").drop("__zkey").write.mode(
        mode
    ).parquet(path)
