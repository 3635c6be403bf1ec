"""Int8 embedding quantization (operators/quantize.py): cross-engine
code equality, cosine fidelity + scale cancellation, reconstruction
error bound, and the broadcast/no-shuffle scoring plan."""

import math

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators import quantize as Q
from sparkall_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_codes_match_duckdb_mirror(spark, duck, emb):
    got = {
        r["vec_id"]: (list(r["qvec"]), round(r["qscale"], 12))
        for r in Q.quantize_embeddings(emb).select(
            "vec_id", "qvec", "qscale"
        ).collect()
    }
    mirror = {
        vid: (list(qv), round(s, 12))
        for vid, qv, s in duck.execute(
            f"""SELECT vec_id, {Q.quantize_sql('embedding::DOUBLE[]')},
                CASE WHEN list_max(list_transform(embedding::DOUBLE[],
                     x -> abs(x))) > 0
                     THEN list_max(list_transform(embedding::DOUBLE[],
                          x -> abs(x))) / 127.0 ELSE 0.0 END
                FROM embeddings"""
        ).fetchall()
    }
    assert got == mirror
    assert len(got) > 0


def test_codes_in_range_and_absmax_hits_127(spark, emb):
    q = Q.quantize_embeddings(emb)
    bad = q.filter(
        F.exists("qvec", lambda x: (x < -127) | (x > 127))
    ).count()
    assert bad == 0
    # the absmax component quantizes to exactly +/-127 by construction
    no_peak = q.filter(
        ~F.exists("qvec", lambda x: F.abs(x) == 127)
        & (F.col("qscale") > 0)
    ).count()
    assert no_peak == 0


def test_reconstruction_error_bounded_by_half_scale(spark, emb):
    q = Q.quantize_embeddings(emb).withColumn(
        "maxerr",
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                Q.dequantize_expr("qvec", "qscale"),
                lambda a, b: F.abs(a - b),
            )
        ),
    )
    # |v - q*s| <= s/2 + tiny float slack
    viol = q.filter(
        F.col("maxerr") > F.col("qscale") * 0.5 + 1e-12
    ).count()
    assert viol == 0


def test_quantized_cosine_tracks_float_cosine(spark, emb):
    queries = emb.filter(F.col("vec_id") < 4)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    qk = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in Q.quantized_topk(emb, queries, k=5).collect()
    }
    # per-pair cosine agreement within quantization error of the pairs
    # both metrics rank in their top-5 (int8 keeps ~2 decimal digits)
    shared = set(exact) & set(qk)
    assert shared, "top-5 sets must overlap"
    assert len(shared) >= len(exact) * 0.6
    for key in shared:
        assert math.isclose(exact[key], qk[key], abs_tol=0.02)


def test_zero_vector_and_null_safety(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0]), (3, None)],
        "vec_id bigint, embedding array<double>",
    )
    rows = {
        r["vec_id"]: (
            None if r["qvec"] is None else list(r["qvec"]),
            r["qscale"],
        )
        for r in Q.quantize_embeddings(df).collect()
    }
    assert rows[1] == ([0, 0], 0.0)
    assert rows[2][0] == [64, -127]  # 1.0/(2/127) = 63.5 -> floor(64.0)
    assert rows[3] == (None, None)


def test_quantized_topk_plan_broadcasts_queries(spark, emb):
    out = Q.quantized_topk(emb, emb.filter(F.col("vec_id") < 4), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # corpus side reaches the scorer without a shuffle; the only
    # Exchange is the final per-query window partitioning
    assert plan.count("Exchange hashpartitioning") <= 1


def test_ivf_topk_q8_equals_quantized_brute_within_probed_cells(spark, emb):
    import numpy as np

    from sparkall_spark.operators.quantize import ivf_topk_q8, quantized_topk
    from sparkall_spark.operators.similarity import (
        assign_cells,
        nearest_cells_arrow,
    )

    cents = np.random.default_rng(7).standard_normal((8, 64))
    queries = emb.filter(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_topk_q8(emb, queries, cents, k=5, nprobe=3).collect()
    }
    # reference: quantized brute force restricted to each query's
    # probed cells
    cells = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id",
            assign_cells(F.col("embedding").cast("array<double>"), cents).alias("c"),
        ).collect()
    }
    probed = {
        r["vec_id"]: set(r["p"])
        for r in queries.select(
            "vec_id",
            nearest_cells_arrow(
                F.col("embedding").cast("array<double>"), cents, 3
            ).alias("p"),
        ).collect()
    }
    brute = quantized_topk(emb, queries, k=500).collect()
    want = {}
    for qid in probed:
        cands = sorted(
            (
                (r["neighbor_id"], r["cosine"])
                for r in brute
                if r["query_id"] == qid
                and cells[r["neighbor_id"]] in probed[qid]
            ),
            key=lambda x: (-x[1], x[0]),
        )[:5]
        for rank, (nid, cos) in enumerate(cands, start=1):
            want[(qid, rank)] = (nid, cos)
    assert got == want
    assert len(got) > 0
