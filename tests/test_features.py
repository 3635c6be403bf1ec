"""Hashed bag-of-words vectors (operators/features.py): DuckDB mirror,
composition with the embedding-space operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.features import (
    hashed_token_vectors,
    hashed_vector_sql,
)
from tests.conftest import assert_matches_oracle

DIM = 16


def test_vectors_match_oracle(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hashed_token_vectors(docs, dim=DIM).select(
        "doc_id", F.transform("vector", lambda x: F.round(x, 6)).alias("vector")
    )
    sql = f"""
WITH base AS ({hashed_vector_sql(DIM)})
SELECT doc_id, list_transform(vector, x -> round(x, 6)) AS vector
FROM base
"""
    assert_matches_oracle(out, duck, sql)


def test_vector_shape_and_norm(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = hashed_token_vectors(docs, dim=DIM).collect()
    assert all(len(r["vector"]) == DIM for r in rows)
    for r in rows[:50]:
        n2 = sum(x * x for x in r["vector"])
        assert n2 == 0 or abs(n2 - 1.0) < 1e-9


def test_zero_token_docs_get_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["vector"]
            for r in hashed_token_vectors(df, dim=8).collect()}
    assert rows[1] == [0.0] * 8 and rows[2] == [0.0] * 8
    assert any(x != 0 for x in rows[3])


def test_idf_damps_ubiquitous_tokens(spark):
    # 'the' occurs in every doc; idf damping must shrink its bucket's
    # relative weight vs the raw-TF vector
    df = spark.createDataFrame(
        [(i, "the unique%d" % i) for i in range(10)],
        "doc_id long, text string",
    )
    from sparkall_spark.functions.text import vocabulary

    vocab = vocabulary(df, text_col="text").select("token", "doc_freq")
    raw = hashed_token_vectors(df, dim=8, normalize=False)
    damped = hashed_token_vectors(df, dim=8, idf=vocab, normalize=False)
    r = raw.filter(F.col("doc_id") == 0).collect()[0]["vector"]
    d = damped.filter(F.col("doc_id") == 0).collect()[0]["vector"]
    assert sum(d) < sum(r)  # every damped weight <= 1, 'the' well below


def test_composes_with_distributed_kmeans(spark, sf_dir):
    from sparkall_spark.operators.clustering import kmeans_fit_assign

    import numpy as np

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vecs = hashed_token_vectors(docs, dim=DIM)
    # explicit init: the default seeds from a LIMIT sample, which is
    # partitioning-dependent by design — fixed centroids make the whole
    # chain deterministic
    init = np.abs(np.random.default_rng(3).normal(size=(4, DIM)))
    assigned, cents = kmeans_fit_assign(
        vecs, vec_col="vector", n_cells=4, iters=1, init=init
    )
    counts = dict(
        (r["cell"], r["count"])
        for r in assigned.groupBy("cell").count().collect()
    )
    assert sum(counts.values()) == docs.count()
    assert len(counts) > 1  # text clusters are non-degenerate
    # determinism across partitioning
    a2, _ = kmeans_fit_assign(
        vecs.repartition(5), vec_col="vector", n_cells=4, iters=1, init=init
    )
    assert (
        assigned.select("doc_id", "cell").orderBy("doc_id").collect()
        == a2.select("doc_id", "cell").orderBy("doc_id").collect()
    )


def test_validation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        hashed_token_vectors(docs, dim=1)


def test_composes_with_semdedup_text_only(spark):
    """Text-only semantic dedup end-to-end: hashed vectors feed
    semdedup directly — near-identical documents (one token changed)
    land in the same cell and collapse, distinct topics survive."""
    import numpy as np
    from sparkall_spark.operators.dedup import semdedup

    base_a = "alpha beta gamma delta epsilon zeta eta theta"
    base_b = "one two three four five six seven eight nine ten"
    rows = (
        [(i, base_a + f" tail{i % 2}") for i in range(4)]
        + [(10 + i, base_b) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_token_vectors(df, dim=16)
    cents = np.abs(np.random.default_rng(1).normal(size=(2, 16)))
    kept = semdedup(
        vecs, id_col="doc_id", vec_col="vector",
        threshold=0.95, centroids=cents,
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    # exact copies collapse (10,11,12 -> 10); the near-identical
    # alpha-family keeps at most one per distinct tail
    assert 10 in ids and 11 not in ids and 12 not in ids
    assert len([i for i in ids if i < 10]) <= 2


def test_compression_ratio_orders_text_classes(spark):
    """Repetitive text compresses hard, prose lands mid-range, random
    bytes barely compress — and values are deterministic."""
    import random
    import string

    from sparkall_spark.operators.features import compression_ratio

    rng = random.Random(7)
    noise = "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(2000))
    rows = [
        (1, "spam " * 400),
        (2, "The quick brown fox jumps over the lazy dog. " * 40),
        (3, noise),
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert got[1]["compression_ratio"] < 0.05          # pure repetition
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"] < 0.25
    assert got[3]["compression_ratio"] > 0.6           # high entropy
    assert got[4]["compression_ratio"] == 1.0 and got[4]["compressed_len"] == 0
    assert got[5]["compression_ratio"] == 1.0
    # deterministic across runs/partitionings
    again = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(docs.repartition(4)).collect()
    }
    assert again == {d: r["compression_ratio"] for d, r in got.items()}
