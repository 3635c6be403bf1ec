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


def test_curriculum_order_bins_monotone_and_deterministic(spark, sf_dir):
    from pyspark.sql import functions as F

    from sparkall_spark.operators.ordering import curriculum_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = curriculum_order(docs, "n_chars", n_bins=4, seed=1)
    rows = out.collect()
    # bins appear in nondecreasing order across the whole output
    bins = [r["curriculum_bin"] for r in rows]
    assert bins == sorted(bins)
    assert set(bins) == {0, 1, 2, 3}
    # binning is monotone in the score: max score of bin b <= min of b+1
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["curriculum_bin"], []).append(r["n_chars"])
    for b in range(3):
        assert max(by_bin[b]) <= min(by_bin[b + 1])
    # quantile binning: no bin dominates (sizes within 2x of each other)
    sizes = [len(v) for _, v in sorted(by_bin.items())]
    assert max(sizes) <= 2 * min(sizes)
    # deterministic rerun, and a different seed reorders within bins
    again = [r["doc_id"] for r in curriculum_order(
        docs, "n_chars", n_bins=4, seed=1
    ).collect()]
    assert again == [r["doc_id"] for r in rows]
    other = [r["doc_id"] for r in curriculum_order(
        docs, "n_chars", n_bins=4, seed=2
    ).collect()]
    assert other != again


def test_curriculum_order_null_scores_and_anticurriculum(spark):
    from pyspark.sql import functions as F

    from sparkall_spark.operators.ordering import curriculum_order

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)] + [(100, None)],
        "doc_id bigint, score double",
    )
    rows = curriculum_order(df, "score", id_col="doc_id", n_bins=4).collect()
    # the null-score doc sits in the last scheduled bin
    null_bin = [r["curriculum_bin"] for r in rows if r["doc_id"] == 100]
    assert null_bin == [3]
    anti = curriculum_order(
        df, "score", id_col="doc_id", n_bins=4, ascending=False
    ).collect()
    # hard-first: the top-score docs now come first
    first_bin_scores = [
        r["score"] for r in anti if r["curriculum_bin"] == 0 and r["score"] is not None
    ]
    assert min(first_bin_scores) > 20
