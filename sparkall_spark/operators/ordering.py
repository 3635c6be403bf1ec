"""Deterministic global shuffle for training order.

Pretraining pipelines need a reproducible, seed-controlled random order
over the whole corpus (and a different one per epoch) — `df.sample` /
`rand()` are partition-layout-dependent and irreproducible across
retries, so the correct primitive is ORDER BY a deterministic hash of
the row id and the seed.

100 TB design: one range-partitioned sort (Spark's TimSort + range
exchange — the same machinery as any global ORDER BY), nothing
driver-side.  The sort key is the engine-portable LCG mix from
operators/sampling.py, so the order is bit-reproducible across Spark
versions, partition counts, retries, AND mirrors exactly in ANSI SQL
(tested against DuckDB).  For epoch variation pass ``seed=epoch``.

``shard_shuffle`` composes the shuffle with ``pack_sequences``-style
shard assignment: rows land in ``n_shards`` contiguous output files,
each internally ordered by the same hash — the standard layout for
sharded dataloaders (readers stream shard k in order and the global
order is recovered by interleaving).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkall_spark.operators.sampling import _mix, mix_sql


def shuffle_key(id_col: Column | str, seed: int = 0) -> Column:
    """The deterministic sort key: LCG mix of (id, seed), with the id
    itself as tiebreak (ids colliding in the mix stay deterministic)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return _mix(c, seed)


def shuffle_key_sql(col_sql: str, seed: int = 0) -> str:
    return mix_sql(col_sql, seed)


def shuffle_corpus(
    df: DataFrame, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Rows in deterministic pseudo-random order (stable across runs,
    partitionings, and engines).  Different ``seed`` → different order."""
    return df.orderBy(
        shuffle_key(id_col, seed).asc(), F.col(id_col).asc()
    )


def shard_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int = 64,
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic shuffle + shard assignment for sharded dataloaders.

    Adds ``shard_col`` in [0, n_shards) from the shuffle key (so shard
    membership is itself pseudo-random and reproducible) and sorts
    WITHIN each shard by the key: ``repartition(shard).sortWithinPartitions``
    writes one internally-ordered file per shard with no global sort
    barrier — at 100 TB this is one hash exchange instead of a full
    range-partitioned sort."""
    key = shuffle_key(id_col, seed)
    out = df.withColumn(shard_col, (key % n_shards).cast("int"))
    return out.repartition(n_shards, F.col(shard_col)).sortWithinPartitions(
        key.asc(), F.col(id_col).asc()
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_bins: int = 4,
    seed: int = 0,
    ascending: bool = True,
    bin_col: str = "curriculum_bin",
    sample_k: int = 4096,
) -> DataFrame:
    """Curriculum training order: quantile-bin documents by a quality /
    difficulty score, then deterministically shuffle WITHIN each bin —
    the standard easy-to-hard schedule (Bengio et al., ICML'09) with
    this repo's reproducibility contract (retries, engines, and
    partition layouts all see the same order; ``seed=epoch`` varies
    the within-bin order per epoch without moving bin boundaries).

    Bin thresholds come from the deterministic bottom-k sampled
    quantiles (``operators/sketches.sampled_quantiles`` — bounded,
    layout-independent, mergeable), so the only driver-side data is
    ``n_bins - 1`` doubles; the bin assignment is then one map-side
    comparison chain and the output order is a single range-partitioned
    sort on (bin, shuffle_key) — the same 100 TB shape as
    :func:`shuffle_corpus`.  ``ascending=False`` flips to hard-first
    (anti-curriculum).  NULL scores land in the LAST bin scheduled
    (unknown difficulty defers), documented not incidental.
    """
    out = curriculum_bin(
        df, score_col, id_col=id_col, n_bins=n_bins,
        ascending=ascending, bin_col=bin_col, sample_k=sample_k,
    )
    return out.orderBy(
        F.col(bin_col).asc(),
        shuffle_key(id_col, seed).asc(),
        F.col(id_col).asc(),
    )


def curriculum_bin(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_bins: int = 4,
    ascending: bool = True,
    bin_col: str = "curriculum_bin",
    sample_k: int = 4096,
) -> DataFrame:
    """The binning half of :func:`curriculum_order` without the global
    sort — attach the difficulty bin as a column (map-side comparison
    chain once the thresholds are known) and leave ordering to the
    writer.  Thresholds are sampled with a PINNED seed: epoch seeds
    must vary only the within-bin order, never the bin boundaries —
    a seed-dependent sample would reshuffle documents ACROSS
    difficulty bins between epochs (review catch)."""
    from sparkall_spark.operators.sketches import sampled_quantiles

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    probs = [i / n_bins for i in range(1, n_bins)]
    thresholds = [
        r["quantile_est"]
        for r in sampled_quantiles(
            df, score_col, id_col, probs, k=sample_k, seed=0
        )
        .orderBy("prob")
        .collect()
    ]
    c = F.col(score_col).cast("double")
    raw = sum(
        ((c > F.lit(float(t))).cast("int") for t in thresholds),
        F.lit(0),
    )
    if not ascending:
        raw = F.lit(n_bins - 1) - raw
    return df.withColumn(bin_col, F.coalesce(raw, F.lit(n_bins - 1)))
