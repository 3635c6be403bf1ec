"""Deterministic corpus shuffle: DuckDB order mirror, seed behavior,
partitioning invariance, shard layout."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.ordering import (
    shard_shuffle,
    shuffle_corpus,
    shuffle_key_sql,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_order_matches_duckdb_mirror(docs, duck):
    got = [r["doc_id"] for r in shuffle_corpus(docs, seed=7).collect()]
    key = shuffle_key_sql("doc_id", 7)
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents ORDER BY {key}, doc_id"
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_seed_changes_order_run_repeats(docs):
    a = [r["doc_id"] for r in shuffle_corpus(docs, seed=1).collect()]
    b = [r["doc_id"] for r in shuffle_corpus(docs, seed=2).collect()]
    a2 = [r["doc_id"] for r in shuffle_corpus(docs, seed=1).collect()]
    assert a == a2  # reproducible
    assert a != b  # epoch variation
    assert sorted(a) == sorted(b)  # permutation, not sample


def test_partitioning_invariance(docs):
    """The order must not depend on the input partition layout."""
    a = [r["doc_id"] for r in shuffle_corpus(docs, seed=3).collect()]
    b = [
        r["doc_id"]
        for r in shuffle_corpus(docs.repartition(17), seed=3).collect()
    ]
    assert a == b


def test_shard_shuffle_layout(docs):
    out = shard_shuffle(docs, seed=5, n_shards=8)
    rows = out.select("doc_id", "shard").collect()
    shards = {r["shard"] for r in rows}
    assert shards <= set(range(8)) and len(shards) > 1
    # shard membership is deterministic
    rows2 = shard_shuffle(docs, seed=5, n_shards=8).select(
        "doc_id", "shard"
    ).collect()
    assert {(r["doc_id"], r["shard"]) for r in rows} == {
        (r["doc_id"], r["shard"]) for r in rows2
    }
    # within a partition, rows are ordered by the shuffle key: verify via
    # mapInArrow-free check — collect per shard and compare to sorted
    from sparkall_spark.operators.ordering import shuffle_key

    per_part = out.withColumn("k", shuffle_key("doc_id", 5)).select(
        F.spark_partition_id().alias("p"), "k"
    ).collect()
    by_p: dict[int, list] = {}
    for r in per_part:
        by_p.setdefault(r["p"], []).append(r["k"])
    for ks in by_p.values():
        assert ks == sorted(ks)


def test_no_global_sort_in_shard_plan(docs):
    """shard_shuffle must hash-exchange + sort within partitions — a
    range exchange (global sort barrier) would serialize 100 TB through
    a single sampled range partitioner."""
    plan = shard_shuffle(docs, seed=5)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    assert "Sort" in plan  # the within-partition sort is there
