"""Distributed logistic regression (operators/logreg.py): cross-engine
bit-exact training, deterministic under repartitioning, and actually
learns a separable corpus."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators._cache import release_caches
from sparkall_spark.operators.logreg import (
    _half_away,
    logreg_oracle_sql,
    logreg_score,
    logreg_scores_oracle_sql,
    train_logreg,
)


def _labeled(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.withColumn("y", (F.col("lang") == "en").cast("int"))


def test_half_away_matches_round_semantics():
    # half away from zero, exact integers — the same convention as
    # round() on doubles in Spark and DuckDB
    assert _half_away(5, 2) == 3      # 2.5 -> 3
    assert _half_away(-5, 2) == -3    # -2.5 -> -3
    assert _half_away(4, 2) == 2
    assert _half_away(0, 7) == 0
    assert _half_away(1, 3) == 0      # 0.33 -> 0
    assert _half_away(2, 3) == 1      # 0.67 -> 1


def test_train_matches_duckdb_oracle(spark, duck, sf_dir):
    """Weights AND bias are bit-identical to the unrolled-CTE mirror
    (integer-exact update; the sigmoid's last-ulp risk dies in the
    per-row micro rounding)."""
    w, b = train_logreg(_labeled(spark, sf_dir), "y", n_buckets=64, iters=3)
    release_caches()
    rows = dict(
        duck.execute(
            logreg_oracle_sql("lang = 'en'", n_buckets=64, iters=3)
        ).fetchall()
    )
    assert rows.pop(-1) == b
    assert [rows[j] for j in range(64)] == w
    assert any(x != 0 for x in w)  # training moved off the origin


def test_scores_match_duckdb_oracle(spark, duck, sf_dir):
    labeled = _labeled(spark, sf_dir)
    w, b = train_logreg(labeled, "y", n_buckets=64, iters=3)
    got = {
        r["doc_id"]: r["margin_micro"]
        for r in logreg_score(labeled, w, b).collect()
    }
    release_caches()
    expected = dict(
        duck.execute(
            logreg_scores_oracle_sql("lang = 'en'", n_buckets=64, iters=3)
        ).fetchall()
    )
    assert got == expected


def test_training_is_partitioning_invariant(spark, sf_dir):
    """Exact integer sums make the learned model independent of input
    partitioning and shuffle order."""
    labeled = _labeled(spark, sf_dir)
    w1, b1 = train_logreg(labeled, "y", n_buckets=32, iters=2)
    release_caches()
    w2, b2 = train_logreg(
        labeled.repartition(7), "y", n_buckets=32, iters=2
    )
    release_caches()
    assert (w1, b1) == (w2, b2)


def test_learns_separable_corpus(spark):
    """A trivially separable corpus: after a few iterations the margin
    sign predicts the label for every document."""
    rows = []
    for i in range(40):
        rows.append((i, "quality prose with informative words", 1))
        rows.append((100 + i, "buy cheap pills casino winner spam", 0))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    w, b = train_logreg(docs, "y", n_buckets=32, iters=8, lr_den=1)
    scored = logreg_score(docs, w, b).join(
        docs.select("doc_id", "y"), "doc_id"
    )
    wrong = scored.filter(
        ((F.col("margin_micro") > 0) & (F.col("y") == 0))
        | ((F.col("margin_micro") <= 0) & (F.col("y") == 1))
    ).count()
    release_caches()
    assert wrong == 0


def test_large_model_broadcast_path_matches_literal(spark, monkeypatch):
    """Above _LITERAL_WEIGHT_LIMIT the weight vector rides as a
    broadcast (bucket, weight) table instead of a literal array (r7
    ADVICE item 5: an ~8 MB literal at 1M buckets would hit
    planner/codegen limits).  Both paths must attach identical BIGINT
    weights — scores AND trained weights bit-equal."""
    import sparkall_spark.operators.logreg as L

    rows = []
    for i in range(30):
        rows.append((i, "quality prose with informative words", 1))
        rows.append((100 + i, "buy cheap pills casino winner spam", 0))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])

    w_lit, b_lit = train_logreg(docs, "y", n_buckets=64, iters=3)
    s_lit = {
        r["doc_id"]: r["margin_micro"]
        for r in logreg_score(docs, w_lit, b_lit).collect()
    }
    release_caches()

    monkeypatch.setattr(L, "_LITERAL_WEIGHT_LIMIT", 8)  # force broadcast
    w_bc, b_bc = train_logreg(docs, "y", n_buckets=64, iters=3)
    s_bc = {
        r["doc_id"]: r["margin_micro"]
        for r in logreg_score(docs, w_bc, b_bc).collect()
    }
    release_caches()

    assert (w_bc, b_bc) == (w_lit, b_lit)
    assert s_bc == s_lit

    # and the plan actually broadcasts instead of inlining the array
    plan = (
        logreg_score(docs, w_bc, b_bc)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_empty_docs_hit_bias_only(spark):
    docs = spark.createDataFrame(
        [(1, "some words here", 1), (2, "", 0), (3, "   ", 1)],
        ["doc_id", "text", "y"],
    )
    w, b = train_logreg(docs, "y", n_buckets=16, iters=2)
    scores = {
        r["doc_id"]: r["margin_micro"]
        for r in logreg_score(docs, w, b).collect()
    }
    release_caches()
    assert scores[2] == b and scores[3] == b  # tokenless -> bare bias
    assert set(scores) == {1, 2, 3}


def test_parameter_validation(spark):
    docs = spark.createDataFrame([(1, "x", 1)], ["doc_id", "text", "y"])
    with pytest.raises(ValueError):
        train_logreg(docs, "y", iters=0)
    with pytest.raises(ValueError):
        train_logreg(docs, "y", n_buckets=1)
    with pytest.raises(ValueError):
        train_logreg(docs.filter("doc_id < 0"), "y")


def test_null_and_out_of_range_labels_rejected(spark):
    docs = spark.createDataFrame(
        [(1, "x y", 1), (2, "z", None)], "doc_id bigint, text string, y int"
    )
    with pytest.raises(ValueError, match="NULL"):
        train_logreg(docs, "y", n_buckets=8, iters=1)
    release_caches()
    bad = spark.createDataFrame(
        [(1, "x y", 2), (2, "z", 0)], "doc_id bigint, text string, y int"
    )
    with pytest.raises(ValueError, match="0/1"):
        train_logreg(bad, "y", n_buckets=8, iters=1)
    release_caches()
