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
