"""Distributed k-means (operators/clustering.py) vs DuckDB unrolled
Lloyd-round CTE oracles and a numpy twin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_fit_assign,
)
from tests.conftest import assert_matches_oracle

DIM, K, ITERS = 64, 5, 2


def _init() -> np.ndarray:
    return np.random.default_rng(7).normal(size=(K, DIM))


from sparkall_spark.operators.clustering import (  # noqa: E402
    kmeans_assign_oracle_sql as _oracle_sql,
)


def test_distributed_lloyd_matches_unrolled_oracle(spark, duck, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    init = _init()
    cents, history = kmeans_fit(emb, iters=ITERS, init=init)
    assert len(history) == ITERS + 1
    assert np.array_equal(history[0], init)
    assert np.array_equal(history[-1], cents)
    out = kmeans_assign(emb, cents).select("vec_id", "cell")
    assert_matches_oracle(out, duck, _oracle_sql(init, ITERS))


def test_numpy_twin_small_fixture(spark):
    """Exact agreement with a sequential numpy Lloyd twin, including
    the empty-cell carry-over rule (centroid 2 never wins a point)."""
    pts = np.array(
        [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]], dtype=float
    )
    init = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]])
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    cents, _ = kmeans_fit(df, iters=3, init=init)

    ref = init.copy()
    for _ in range(3):
        d = pts @ ref.T
        den = np.linalg.norm(pts, axis=1)[:, None] * np.linalg.norm(
            ref, axis=1
        )[None, :]
        cos = np.divide(d, den, out=np.zeros_like(d), where=den > 0)
        r6 = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)
        assign = (ref.shape[0] - 1) - np.argmax(r6[:, ::-1], axis=1)
        nxt = ref.copy()
        for j in range(ref.shape[0]):
            if (assign == j).any():
                nxt[j] = pts[assign == j].mean(axis=0)
        ref = nxt
    assert np.allclose(cents, ref, rtol=0, atol=0)
    assert np.array_equal(cents[2], init[2])  # empty cell untouched


def test_partitioning_invariance_of_fit_assign(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    init = _init()
    a, ca = kmeans_fit_assign(emb, iters=1, init=init)
    b, cb = kmeans_fit_assign(emb.repartition(7), iters=1, init=init)
    # per-cell means are distributed float sums: partitioning changes
    # summation order, so centroids agree to ~1e-12, and the 6dp-rounded
    # assignment is identical
    assert np.allclose(ca, cb, rtol=1e-9, atol=1e-12)
    assert (
        a.select("vec_id", "cell").orderBy("vec_id").collect()
        == b.select("vec_id", "cell").orderBy("vec_id").collect()
    )


def test_validation(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError):
        kmeans_fit(emb, iters=-1)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_fit(empty, iters=1)
