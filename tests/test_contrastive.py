"""Contrastive pair-mining tests (operators/contrastive.py)."""

from pyspark.sql import functions as F

from sparkall_spark.operators import contrastive as C
from tests.conftest import assert_matches_oracle


def test_chunk_documents_basic(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "")], ["doc_id", "text"]
    )
    rows = C.chunk_documents(df, chunk_tokens=2).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunks"]) for r in rows}
    assert got[(1, 0)] == ("a b", 3)
    assert got[(1, 1)] == ("c d", 3)
    assert got[(1, 2)] == ("e", 3)  # trailing partial chunk
    assert got[(2, 0)] == ("x", 1)
    assert (3, 0) not in got  # empty doc vanishes


def test_contrastive_pairs_law(spark):
    # doc 10: 4 chunks of 2 tokens -> a = 10%4 = 2, p = (2+1+10%3)%4 = 0
    df = spark.createDataFrame(
        [
            (10, "t0 t1 t2 t3 t4 t5 t6 t7"),
            (11, "u0 u1 u2 u3"),  # n=2: a=11%2=1, p=(1+1+0)%2=0
            (12, "single"),  # n=1 -> excluded
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in C.contrastive_pairs(df, chunk_tokens=2, n_buckets=1).collect()}
    assert set(out) == {10, 11}
    assert out[10]["anchor"] == "t4 t5" and out[10]["positive"] == "t0 t1"
    assert out[11]["anchor"] == "u2 u3" and out[11]["positive"] == "u0 u1"
    # single bucket of two docs: each doc's negative is the other's anchor
    assert out[10]["negative"] == out[11]["anchor"]
    assert out[11]["negative"] == out[10]["anchor"]


def test_contrastive_pairs_singleton_bucket_null_negative(spark):
    df = spark.createDataFrame([(7, "a b c d")], ["doc_id", "text"])
    rows = C.contrastive_pairs(df, chunk_tokens=2, n_buckets=4).collect()
    assert len(rows) == 1 and rows[0]["negative"] is None


def test_contrastive_pairs_matches_duckdb_mirror(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = C.contrastive_pairs(docs, chunk_tokens=16, n_buckets=8)
    sql = C.contrastive_pairs_sql(chunk_tokens=16, n_buckets=8)
    assert_matches_oracle(out, duck, sql)
    # non-vacuous: pairs exist, anchors differ from positives
    sample = out.limit(50).collect()
    assert sample
    assert all(r["anchor"] != r["positive"] for r in sample)
    assert all(r["negative"] is not None for r in sample)
