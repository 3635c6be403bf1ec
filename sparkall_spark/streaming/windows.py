"""Structured Streaming helpers (extension — SURVEY.md §2.9: the
reference has no streaming surface; this is the Spark-first capability
the `events` fixture exists for).

Every helper takes either a *streaming* DataFrame (from ``readStream``)
or a batch one — the transformations are identical; only the sink
differs.  Watermarks apply only on streaming inputs (no-op on batch is
handled by the caller passing watermark=None).

Scale notes: tumbling/sliding aggregation is Spark's incremental
stateful agg (partial aggregation per micro-batch, state keyed by
window+keys); sessionization uses ``session_window`` (built-in gap
sessions, state pruned by watermark).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    if delay and df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregation: one row per (window, keys).

    Output flattens the window struct to ``window_start``/``window_end``
    so results are plain columns (oracle-friendly).
    """
    df = with_watermark(df, ts_col, watermark)
    group = [F.window(F.col(ts_col), window).alias("__w")] + [
        F.col(k) for k in (keys or [])
    ]
    out = df.groupBy(*group).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[c for c in out.columns if c != "__w"],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window aggregation (window length, slide interval)."""
    df = with_watermark(df, ts_col, watermark)
    group = [F.window(F.col(ts_col), window, slide).alias("__w")] + [
        F.col(k) for k in (keys or [])
    ]
    out = df.groupBy(*group).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[c for c in out.columns if c != "__w"],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: list[Column],
    keys: list[str],
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via the built-in ``session_window``
    (stateful, watermark-pruned on streams; plain agg on batch)."""
    df = with_watermark(df, ts_col, watermark)
    group = [F.session_window(F.col(ts_col), gap).alias("__w")] + [
        F.col(k) for k in keys
    ]
    out = df.groupBy(*group).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("session_start"),
        F.col("__w.end").alias("session_end"),
        *[c for c in out.columns if c != "__w"],
    )


def stream_events(
    spark,
    path: str,
    schema=None,
    max_files_per_trigger: int = 1,
    ts_nanos_col: str | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (for tests/demos).

    A real deployment would point readStream at Kafka/Kinesis; the file
    source exercises the identical incremental execution path.
    ``ts_nanos_col`` handles TIMESTAMP(NANOS) parquet columns (read as
    long, truncated to micro-precision timestamps).
    """
    if ts_nanos_col:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if ts_nanos_col:
        from sparkall_spark.fixtures import _normalize_event_ts

        df = _normalize_event_ts(df, ts_nanos_col)
    return df


def stream_exact_dedup(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "text",
    watermark: str = "10 minutes",
    fingerprint_key: bool = True,
) -> DataFrame:
    """Streaming exact dedup: drop rows whose (fingerprinted) key was
    already seen within the watermark horizon — the streaming
    counterpart of operators.dedup.exact_dedup for ingest pipelines.

    ``dropDuplicatesWithinWatermark`` keys the state store on the
    64-bit-ish fingerprint (8-byte state entries, not document bodies)
    and evicts state older than the watermark, so state size is bounded
    by the dedup horizon, not the stream's lifetime — the property that
    makes this safe on an unbounded 100 TB/day feed."""
    from sparkall_spark.functions.text import fingerprint

    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        # watermarks require TIMESTAMP; under the UTC session tz the
        # cast is value-preserving
        stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    key = fingerprint(key_col) if fingerprint_key else F.col(key_col)
    return (
        stream_df.withColumn("__fp", key)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Start the stream into an in-memory table and wait for all data.

    Returns the StreamingQuery; callers read results via
    ``spark.sql(f"SELECT * FROM {name}")`` after processAllAvailable().
    """
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def stream_signature_dedup(
    stream_df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Streaming NEAR-dup dedup at signature granularity (r4): drop
    documents whose full MinHash signature was already seen within the
    watermark horizon.

    Honest semantics: signature-identical is a strict (high-precision,
    partial-recall) form of near-duplication — identical signatures
    imply very high Jaccard, but near-dups that differ in any hash
    survive.  That is the trade the streaming model forces: the banded
    LSH candidate JOIN of the batch pipeline has no bounded-state
    streaming equivalent, while signature-keyed
    ``dropDuplicatesWithinWatermark`` keeps ONE compact state entry per
    distinct signature and evicts by watermark.  Run the batch
    `minhash_dedup` periodically for full-recall compaction; use this
    to cheaply thin obvious near-dup floods at ingest."""
    from sparkall_spark.operators.dedup import minhash_signature
    from sparkall_spark.functions.text import token_set

    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    # same shingling as the batch pipeline (ngram=1 -> token set)
    sig = minhash_signature(
        token_set(text_col), k=num_hashes, seed=seed
    ).cast("array<string>")
    return (
        stream_df.withColumn("__sig", F.concat_ws(",", sig))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__sig"])
        .drop("__sig")
    )
