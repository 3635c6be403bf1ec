"""Durable streaming sinks: exactly-once parquet append and keyed upsert.

The reference has no streaming at all (SURVEY §2.9); this completes the
extension's write side:

- :func:`write_stream_parquet` — the built-in file sink: append-only
  parquet with a checkpointed WAL; Spark's file-sink manifest gives
  exactly-once per-file semantics for free.
- :func:`foreach_batch_upsert` — keyed upsert (the MERGE pattern)
  without a lakehouse format: the target is parquet partitioned by a
  hash bucket of the key, and each micro-batch rewrites ONLY the
  buckets it touches (dynamic partition overwrite).  Merge = existing
  rows anti-joined on the key, unioned with the batch's latest rows.

100 TB design for the upsert:
- the target is bucket-partitioned, so a batch touching k keys reads
  and rewrites at most k buckets, not the table — update cost scales
  with the update, not the data;
- per batch, one broadcast anti-join (batch keys are micro-batch-sized)
  and one partition-pruned scan of the touched buckets;
- retries are idempotent: re-merging the same batch produces identical
  bucket contents, and dynamic partition overwrite replaces whole
  bucket directories atomically-enough for reprocessing (the same
  guarantee foreachBatch documents: the batch id is stable on retry —
  callers needing stronger transactionality use a table format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET_COL = "__upsert_bucket"


def write_stream_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_once: bool = True,
):
    """Append-only parquet file sink with checkpointed exactly-once
    manifest.  Returns the started StreamingQuery."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def _bucket(col, n_buckets: int):
    # hash the canonical STRING form: xxhash64 is type-sensitive (int 7
    # and bigint 7 hash differently), and a batch whose key column
    # arrives as a different numeric width would otherwise land in the
    # wrong bucket and leave the stale row alive in the original one
    return F.pmod(F.xxhash64(col.cast("string")), F.lit(n_buckets)).cast("int")


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int = 64,
) -> None:
    """Merge one batch into the bucket-partitioned parquet target at
    ``path``: per key keep the batch's LAST row (by struct max over the
    whole row is non-deterministic — callers pre-dedup if a batch can
    carry several rows per key; here we keep an arbitrary-but-single
    row via dropDuplicates), replacing any existing row with that key.
    Only the touched buckets are read and rewritten."""
    batch = batch.dropDuplicates([key_col]).withColumn(
        BUCKET_COL, _bucket(F.col(key_col), n_buckets)
    )
    touched = [r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect()]
    if not touched:
        return
    try:
        existing = (
            spark.read.parquet(path)
            .filter(F.col(BUCKET_COL).isin(touched))
        )
        keys = batch.select(key_col)
        keep = existing.join(F.broadcast(keys), key_col, "left_anti")
        merged = keep.unionByName(batch)
    except Exception:  # first batch: target does not exist yet
        merged = batch
    (
        merged.repartition(len(touched), F.col(BUCKET_COL))
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def foreach_batch_upsert(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    n_buckets: int = 64,
    trigger_once: bool = True,
):
    """Streaming keyed upsert via foreachBatch + :func:`upsert_batch`.

    Returns the started StreamingQuery.  The sink is idempotent per
    batch (re-merging replaces the same buckets with the same rows), so
    foreachBatch's at-least-once retries converge."""

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        upsert_batch(
            batch.sparkSession, batch, path, key_col, n_buckets
        )

    w = stream_df.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_ingest_documents(
    stream_docs: DataFrame,
    corpus_path: str,
    ledger_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_seen: bool = False,
    trigger_once: bool = True,
    near_ledger_path: str | None = None,
    near_threshold: float = 0.9,
):
    """Continuous corpus ingest: the streaming twin of
    ``operators.pipeline.ingest_documents``.  Every micro-batch dedups
    against the persisted fingerprint ledger (cross-batch AND
    within-batch), appends the survivors to the parquet corpus, then
    appends their fingerprints to the ledger — so a document seen in
    ANY earlier batch (or earlier batch attempt) never lands twice.

    Exactly-once story, honestly: ``foreachBatch`` is at-least-once on
    retry, but the LEDGER makes the ingest idempotent at the CONTENT
    level — a replayed batch anti-joins to empty against the
    fingerprints its first attempt recorded.  The corpus-first write
    order inside ``ingest_documents`` preserves the
    duplicates-never-losses contract for a crash BETWEEN the two
    appends (repair via ``rebuild_ledger`` + one ``exact_dedup`` pass).
    This is stronger than checkpoint-manifest parquet dedup alone,
    which only dedups by batch id, not by content.

    State story at 100 TB/day: there is NO streaming state store —
    the ledger is bucketed parquet on shared storage, so dedup horizon
    is the corpus lifetime (vs the watermark-bounded
    ``stream_exact_dedup``, which trades horizon for latency).

    ``near_ledger_path`` (r7) additionally drops NEAR-duplicates of any
    earlier-ingested document: each micro-batch runs the one-ledger-pass
    minhash check (``operators.dedup.minhash_dedup_incremental``) after
    the exact gate and appends the kept documents' signature rows.
    Same content-level idempotence: a replayed batch finds itself at
    jaccard 1.0 and keeps nothing; repair via ``rebuild_near_ledger``.

    Cache-registry contract (r8, ADVICE item 3): each micro-batch runs
    inside ``operators._cache.cache_scope()``, so the per-batch release
    unpersists exactly the persists THIS batch's operators registered —
    cache-registering operators running concurrently on the same
    SparkSession (other threads) keep their intermediates.  The scope
    is thread-attributed: the ``foreachBatch`` callback and the
    operators it calls run synchronously on one thread, which is what
    makes the capture precise.

    Returns the started StreamingQuery (``availableNow`` by default —
    drain what exists, then stop; pass ``trigger_once=False`` for a
    continuous query).
    """
    from sparkall_spark.operators.pipeline import ingest_documents

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        from sparkall_spark.operators._cache import cache_scope

        # each micro-batch is a unit of work: the scope drops exactly
        # the operator caches THIS batch registered at exit (or a
        # long-running query accumulates stale blocks batch by batch —
        # the r6 storage-pressure lesson) without touching concurrent
        # actors' caches on the same session.
        with cache_scope():
            ingest_documents(
                batch.sparkSession,
                batch,
                corpus_path,
                ledger_path,
                id_col=id_col,
                text_col=text_col,
                broadcast_seen=broadcast_seen,
                near_ledger_path=near_ledger_path,
                near_threshold=near_threshold,
            )

    w = (
        stream_docs.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_ingest_vectors(
    stream_vecs: DataFrame,
    corpus_path: str,
    ledger_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    trigger_once: bool = True,
    **lsh_params,
):
    """Continuous EMBEDDING ingest: the streaming twin of
    ``operators.pipeline.ingest_vectors`` — every micro-batch
    semantic-dedups against the persisted embedding ledger
    (cross-batch paraphrases dropped, within-batch dominated rule),
    appends survivors to the vector corpus, then appends their ledger
    rows.  Same content-level idempotence-by-ledger, no-streaming-state
    (bucketless parquet ledger, dedup horizon = corpus lifetime), and
    per-micro-batch ``cache_scope`` discipline as
    :func:`stream_ingest_documents`; its consistency contract
    (corpus-first writes, duplicates-never... here: missed-future-
    near-dups-never-losses, repair via ``rebuild_sem_ledger``) is
    inherited from the batch function.  Returns the started
    StreamingQuery (``availableNow`` by default)."""
    from sparkall_spark.operators.pipeline import ingest_vectors

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        from sparkall_spark.operators._cache import cache_scope

        with cache_scope():
            ingest_vectors(
                batch.sparkSession,
                batch,
                corpus_path,
                ledger_path,
                id_col=id_col,
                vec_col=vec_col,
                threshold=threshold,
                **lsh_params,
            )

    w = (
        stream_vecs.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
