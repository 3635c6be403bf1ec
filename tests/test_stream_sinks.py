"""Streaming sinks: exactly-once parquet append + keyed upsert merge."""

import os

import pytest
from pyspark.sql import functions as F

from sparkall_spark.streaming.sinks import (
    BUCKET_COL,
    foreach_batch_upsert,
    upsert_batch,
    write_stream_parquet,
)


def test_upsert_batch_merges_by_key(spark, tmp_path):
    tgt = str(tmp_path / "tgt")
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    upsert_batch(spark, b1, tgt, "k", n_buckets=4)
    b2 = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k int, v string"
    )
    upsert_batch(spark, b2, tgt, "k", n_buckets=4)
    got = {
        (r["k"], r["v"])
        for r in spark.read.parquet(tgt).select("k", "v").collect()
    }
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
    # idempotent: replaying batch 2 changes nothing
    upsert_batch(spark, b2, tgt, "k", n_buckets=4)
    again = {
        (r["k"], r["v"])
        for r in spark.read.parquet(tgt).select("k", "v").collect()
    }
    assert again == got
    # bucket-partitioned layout on disk
    assert any(d.startswith(f"{BUCKET_COL}=") for d in os.listdir(tgt))


def test_upsert_batch_rewrites_only_touched_buckets(spark, tmp_path):
    tgt = str(tmp_path / "tgt2")
    base = spark.range(0, 200).withColumn("v", F.lit("base"))
    upsert_batch(spark, base.withColumnRenamed("id", "k"), tgt, "k", n_buckets=8)
    dirs = {
        d: os.path.getmtime(os.path.join(tgt, d))
        for d in os.listdir(tgt)
        if d.startswith(f"{BUCKET_COL}=")
    }
    assert len(dirs) == 8
    one = spark.createDataFrame([(7, "upd")], "k int, v string")
    # key 7's bucket
    bucket = one.select(
        F.pmod(F.xxhash64(F.col("k").cast("string")), F.lit(8)).cast("int").alias("b")
    ).first()["b"]
    upsert_batch(spark, one, tgt, "k", n_buckets=8)
    after = {
        d: os.path.getmtime(os.path.join(tgt, d))
        for d in os.listdir(tgt)
        if d.startswith(f"{BUCKET_COL}=")
    }
    changed = {d for d in dirs if after[d] != dirs[d]}
    assert changed == {f"{BUCKET_COL}={bucket}"}
    # data correct
    got = dict(
        (r["k"], r["v"]) for r in spark.read.parquet(tgt).collect()
    )
    assert got[7] == "upd" and got[6] == "base" and len(got) == 200


def test_streaming_upsert_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    tgt = str(tmp_path / "tgt3")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).write.mode("overwrite").parquet(str(src / "f1"))

    schema = "k int, v string"
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = foreach_batch_upsert(stream, tgt, ckpt, "k", n_buckets=4)
    q.awaitTermination(60)
    got = {
        (r["k"], r["v"]) for r in spark.read.parquet(tgt).select("k", "v").collect()
    }
    assert got == {(1, "a"), (2, "b")}

    # second wave: update + insert, resume from the checkpoint
    spark.createDataFrame(
        [(2, "B2"), (3, "c")], "k int, v string"
    ).write.mode("overwrite").parquet(str(src / "f2"))
    stream2 = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q2 = foreach_batch_upsert(stream2, tgt, ckpt, "k", n_buckets=4)
    q2.awaitTermination(60)
    got2 = {
        (r["k"], r["v"]) for r in spark.read.parquet(tgt).select("k", "v").collect()
    }
    assert got2 == {(1, "a"), (2, "B2"), (3, "c")}


def test_stream_parquet_append_exactly_once(spark, tmp_path):
    src = tmp_path / "src4"
    src.mkdir()
    out = str(tmp_path / "out4")
    ckpt = str(tmp_path / "ckpt4")
    spark.createDataFrame([(1,), (2,)], "k int").write.mode(
        "overwrite"
    ).parquet(str(src / "f1"))
    stream = spark.readStream.schema("k int").option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = write_stream_parquet(stream, out, ckpt)
    q.awaitTermination(60)
    assert spark.read.parquet(out).count() == 2
    # restart with the same checkpoint: nothing reprocessed
    stream2 = spark.readStream.schema("k int").option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q2 = write_stream_parquet(stream2, out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 2


def test_stream_ingest_documents_ledger_dedup(spark, tmp_path):
    """Streaming ingest with cross-batch CONTENT dedup: duplicates are
    dropped across micro-batches via the fingerprint ledger, and a
    full replay (fresh checkpoint, same files) appends nothing."""
    from sparkall_spark.streaming.sinks import stream_ingest_documents

    src = tmp_path / "ing_src"
    src.mkdir()
    corpus = str(tmp_path / "ing_corpus")
    ledger = str(tmp_path / "ing_ledger")
    schema = "doc_id bigint, text string"

    def stream():
        return spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))

    # wave 1: one within-batch duplicate pair
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")], schema
    ).write.parquet(str(src / "w1"))
    q = stream_ingest_documents(
        stream(), corpus, ledger, str(tmp_path / "ing_ck1")
    )
    q.awaitTermination(120)
    got1 = {r["text"] for r in spark.read.parquet(corpus).collect()}
    assert got1 == {"alpha beta", "gamma delta"}

    # wave 2: a cross-batch duplicate + one genuinely new doc
    spark.createDataFrame(
        [(4, "gamma delta"), (5, "epsilon zeta")], schema
    ).write.parquet(str(src / "w2"))
    q = stream_ingest_documents(
        stream(), corpus, ledger, str(tmp_path / "ing_ck1")
    )
    q.awaitTermination(120)
    got2 = {r["text"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == {"alpha beta", "gamma delta", "epsilon zeta"}
    assert spark.read.parquet(corpus).count() == 3

    # full replay with a FRESH checkpoint: the ledger (content-level
    # idempotence) keeps the corpus unchanged even though every file
    # is reprocessed
    q = stream_ingest_documents(
        stream(), corpus, ledger, str(tmp_path / "ing_ck2")
    )
    q.awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 3


def test_stream_ingest_documents_near_dup_ledger(spark, tmp_path):
    """r7: near-dup streaming ingest — a REORDERED near-copy (same
    token set, different byte content, so the exact fingerprint gate
    passes it) is dropped via the minhash ledger, within-batch and
    cross-batch; fresh-checkpoint replay appends nothing."""
    from sparkall_spark.streaming.sinks import stream_ingest_documents

    src = tmp_path / "nd_src"
    src.mkdir()
    corpus = str(tmp_path / "nd_corpus")
    ledger = str(tmp_path / "nd_ledger")
    near = str(tmp_path / "nd_near")
    schema = "doc_id bigint, text string"

    def stream():
        return spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))

    def run(ck):
        q = stream_ingest_documents(
            stream(), corpus, ledger, str(tmp_path / ck),
            near_ledger_path=near,
        )
        q.awaitTermination(120)

    # wave 1: doc 3 is a token-reorder of doc 1 (jaccard 1.0, different
    # fingerprint) -> dominated within-batch; docs 1 and 2 land
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "one two three four"),
            (3, "delta gamma beta alpha"),
        ],
        schema,
    ).write.parquet(str(src / "w1"))
    run("nd_ck1")
    got1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1, 2}
    assert spark.read.parquet(near).count() == 2

    # wave 2: doc 4 reorders doc 2 (cross-batch near-dup -> dropped via
    # the near ledger), doc 5 is new
    spark.createDataFrame(
        [(4, "four three two one"), (5, "fresh words entirely here")],
        schema,
    ).write.parquet(str(src / "w2"))
    run("nd_ck1")
    got2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == {1, 2, 5}
    assert spark.read.parquet(near).count() == 3

    # fresh-checkpoint full replay: both ledgers make it a no-op
    run("nd_ck2")
    assert spark.read.parquet(corpus).count() == 3
    assert spark.read.parquet(near).count() == 3


def test_ingest_vectors_two_ticks_and_replay(spark, sf_dir, tmp_path):
    """Batch semantic ingest: tick 2's paraphrases of tick 1's vectors
    are dropped by the persisted ledger; replaying tick 1 ingests
    nothing (content-level idempotence)."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators.pipeline import (
        ingest_vectors,
        rebuild_sem_ledger,
    )

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .filter(F.col("vec_id") < 30)
    )
    corpus = str(tmp_path / "vcorpus")
    ledger = str(tmp_path / "vledger")
    t1 = emb.filter(F.col("vec_id") < 20)
    n1 = ingest_vectors(spark, t1, corpus, ledger)
    assert n1 == 20
    # tick 2: 5 paraphrases of tick-1 vectors + 10 novel
    copies = t1.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 700).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(1.01) + F.lit(0.002)
        ).alias("embedding"),
    )
    t2 = emb.filter(F.col("vec_id") >= 20).unionByName(copies)
    n2 = ingest_vectors(spark, t2, corpus, ledger)
    assert n2 == 10
    assert spark.read.parquet(corpus).count() == 30
    # replay tick 1: nothing ingested
    assert ingest_vectors(spark, t1, corpus, ledger) == 0
    # repair path reproduces the ledger row set from the corpus
    rebuild_sem_ledger(spark, corpus, str(tmp_path / "vledger2"))
    a = spark.read.parquet(ledger)
    b = spark.read.parquet(str(tmp_path / "vledger2"))
    assert a.count() == b.count() == 30


def test_stream_ingest_vectors_availablenow(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from sparkall_spark.streaming.sinks import stream_ingest_vectors

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .filter(F.col("vec_id") < 16)
    )
    stage = tmp_path / "vstage"
    stage.mkdir()
    emb.filter(F.col("vec_id") < 8).coalesce(1).write.parquet(
        str(stage / "b0")
    )
    # second file repeats the first batch's vectors under new ids
    # (byte-identical embeddings: qcos 1.0) plus 8 novel rows
    emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 300).alias("vec_id"), "embedding"
    ).unionByName(
        emb.filter(F.col("vec_id") >= 8)
    ).coalesce(1).write.parquet(str(stage / "b1"))
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage / "b*"))
    )
    q = stream_ingest_vectors(
        stream,
        str(tmp_path / "vcorp"),
        str(tmp_path / "vled"),
        str(tmp_path / "vchk"),
    )
    q.awaitTermination(120)
    got = {
        r["vec_id"]
        for r in spark.read.parquet(str(tmp_path / "vcorp")).collect()
    }
    # duplicates of batch-0 vectors never land; novels do
    assert got == set(range(16))
