"""Random-projection (Achlioptas JL) operator tests."""

import math

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators import projection as P
from tests.conftest import assert_matches_oracle


def test_achlioptas_sign_law_and_determinism():
    signs = P.achlioptas_signs(64, 16, seed=97)
    again = P.achlioptas_signs(64, 16, seed=97)
    assert signs == again
    flat = [v for row in signs for v in row]
    assert set(flat) <= {-1, 0, 1}
    # 1/6, 2/3, 1/6 law within loose binomial bounds (1024 draws)
    n = len(flat)
    assert 0.08 < flat.count(1) / n < 0.26
    assert 0.08 < flat.count(-1) / n < 0.26
    assert 0.5 < flat.count(0) / n < 0.8
    assert P.achlioptas_signs(64, 16, seed=98) != signs


def test_project_micro_handcrafted(spark):
    df = spark.createDataFrame([(1, [1.5, 2.0, -3.0])], ["id", "v"])
    signs = [[1, -1, 0], [0, 1, 1], [0, 0, 0]]
    out = (
        df.withColumn("mv", P.micro_quantize("v"))
        .select("id", P.project_micro("mv", signs).alias("p"))
        .collect()[0]["p"]
    )
    assert out == [-500_000, -1_000_000, 0]


def test_scale_projection(spark):
    df = spark.createDataFrame([(1, [3_000_000, -1_000_000])], ["id", "p"])
    got = df.select(P.scale_projection("p", k=3).alias("s")).collect()[0]["s"]
    f = math.sqrt(3.0 / 3) / 1e6
    assert got == pytest.approx([3_000_000 * f, -1_000_000 * f])


def test_random_project_matches_duckdb_mirror(spark, duck, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = (
        P.random_project(emb, "embedding", dim=64, k=8, seed=97)
        .select("vec_id", F.posexplode("proj_micro"))
        .toDF("vec_id", "j", "val")
    )
    proj = P.project_micro_sql("embedding", dim=64, k=8, seed=97)
    sql = f"""
    WITH p AS (SELECT vec_id, {proj} AS pm FROM embeddings)
    SELECT vec_id, CAST(j - 1 AS INT) AS j, pm[j] AS val
    FROM (SELECT vec_id, unnest(range(1, len(pm) + 1)) AS j, pm FROM p) q
    """
    assert_matches_oracle(out, duck, sql)


def test_projection_preserves_distances_roughly(spark, sf_dir):
    """JL sanity: with k=32 the scaled projection keeps pairwise
    distances within a loose constant factor on real embeddings."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    rows = (
        P.random_project(
            emb, "embedding", dim=64, k=32, seed=97, scaled_col="ps"
        )
        .select("vec_id", F.col("embedding").cast("array<double>"), "ps")
        .collect()
    )
    import itertools

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ratios = []
    for r1, r2 in itertools.combinations(rows, 2):
        d0 = dist(r1["embedding"], r2["embedding"])
        d1 = dist(r1["ps"], r2["ps"])
        if d0 > 0:
            ratios.append(d1 / d0)
    assert ratios and all(0.4 < r < 2.5 for r in ratios)
    # the MEDIAN ratio should be near 1 (unbiased estimator)
    ratios.sort()
    assert 0.75 < ratios[len(ratios) // 2] < 1.33
