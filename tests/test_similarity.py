from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

from sparkall_spark.operators import similarity as S


def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_topk_vs_oracle(spark, duck, sf_dir):
    corpus = emb(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5)
    got = S.brute_force_topk(corpus, queries, k=10)
    assert_matches_oracle(
        got,
        duck,
        """
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(q.embedding::DOUBLE[],
                                              c.embedding::DOUBLE[]), 6) AS cosine
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
        QUALIFY rank <= 10
        """,
    )


def test_lsh_recall_against_brute_force(spark, sf_dir):
    corpus = emb(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(corpus, queries, k=5)
    # random 64-dim vectors: true neighbors sit at low cosine, so use
    # short signatures + many tables (p_hit ~ 1-(1-p^bits)^tables)
    approx = S.lsh_topk(corpus, queries, k=5, bits=4, tables=16)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_ivf_recall_against_brute_force(spark, sf_dir):
    corpus = emb(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(corpus, queries, k=5)
    approx = S.ivf_topk(corpus, queries, k=5, n_cells=8, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_cosine_self_similarity(spark, sf_dir):
    df = emb(spark, sf_dir).limit(10).select(
        "vec_id",
        F.round(
            S.cosine_similarity(
                F.col("embedding").cast("array<double>"),
                F.col("embedding").cast("array<double>"),
            ),
            6,
        ).alias("c"),
    )
    for r in df.collect():
        assert abs(r["c"] - 1.0) < 1e-5


def test_bucket_ids_matches_expression_path(spark, sf_dir):
    """The vectorized (numpy matmul) bucket assignment must agree with
    the Column-expression form the SQL oracles mirror, bit-for-bit, on
    the fixture embeddings (divergence is only possible for dots within
    float-rounding distance of zero)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = emb.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    dim, bits, tables, seed = 64, 4, 16, 42
    fast = v.select(
        "__id",
        F.posexplode(S.bucket_ids(F.col("__v"), dim, bits, tables, seed)).alias(
            "tbl", "bkt"
        ),
    )
    slow = v.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        S._bucket_expr(
                            F.col("__v"), S._hyperplanes(dim, bits, t, seed)
                        ).alias("bkt"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("e"),
    ).select("__id", F.col("e.tbl").alias("tbl"), F.col("e.bkt").alias("bkt"))
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_bucket_ids_null_and_ragged_vectors(spark):
    """Null / wrong-length vectors land in bucket 0 of every table —
    the same place the expression path's null-propagation puts them."""
    rows = [(1, [0.5] * 64), (2, None), (3, [0.5] * 3)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = df.select(
        "id", F.posexplode(S.bucket_ids(F.col("v"), 64, 4, 2, 42)).alias("tbl", "bkt")
    )
    got = {(r["id"], r["tbl"]): r["bkt"] for r in out.collect()}
    assert got[(2, 0)] == 0 and got[(2, 1)] == 0
    assert got[(3, 0)] == 0 and got[(3, 1)] == 0
    assert len(got) == 6


def test_ivf_pq_recall_against_brute_force(spark, sf_dir):
    """IVF-PQ + exact refine: with half the cells probed and a 4x
    refine shortlist, recall against brute force must stay high even on
    uniform random vectors (the hard case for ANN)."""
    corpus = emb(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(corpus, queries, k=5)
    approx = S.ivf_pq_topk(
        corpus, queries, k=5, n_cells=8, nprobe=4, m=16, ks=32, refine=8
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF-PQ recall too low: {recall}"
    # refined scores are EXACT cosines: every overlapping pair agrees
    # with brute force bit-for-bit (both round at 6dp)
    escore = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in escore:
            assert abs(r["cosine"] - escore[key]) < 1e-9


def test_pq_encode_shape_and_determinism(spark, sf_dir):
    import numpy as np

    corpus = emb(spark, sf_dir)
    rows = [
        r["e"]
        for r in corpus.select(
            F.col("embedding").cast("array<double>").alias("e")
        ).limit(256).collect()
    ]
    sample = np.asarray(rows)
    books = S.train_pq_codebooks(sample, m=8, ks=16, iters=3, seed=1)
    assert books.shape == (8, 16, sample.shape[1] // 8)
    df = corpus.limit(50).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c1 = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", S.pq_encode(F.col("v"), books).alias("c")).collect()}
    c2 = {r["vec_id"]: r["c"] for r in df.repartition(7).select(
        "vec_id", S.pq_encode(F.col("v"), books).alias("c")).collect()}
    assert c1 == c2  # partition-layout invariant
    assert all(len(v) == 8 and all(0 <= x < 16 for x in v) for v in c1.values())
    # a PQ row is 8 codes vs 64 doubles: the 64x memory claim
    assert sample.shape[1] == 64


def test_ivf_assignment_paths_agree(spark, sf_dir):
    """ivf_topk with assign='arrow' (batched matmul, default) and
    assign='column' (pure-Column fold) return identical results on the
    fixture; bad mode rejected."""
    import numpy as np
    import pytest as _pytest

    from sparkall_spark.operators import similarity as S

    cents = np.random.default_rng(123).standard_normal((16, 64))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 4")
    a = sorted(map(tuple, S.ivf_topk(emb, q, k=5, centroids=cents).collect()))
    b = sorted(
        map(
            tuple,
            S.ivf_topk(emb, q, k=5, centroids=cents, assign="column").collect(),
        )
    )
    assert a == b
    with _pytest.raises(ValueError):
        S.ivf_topk(emb, q, centroids=cents, assign="bogus")


def test_nearest_cells_arrow_bit_equals_expr(spark, sf_dir):
    """ADVICE r6: pin nearest_cells_arrow == nearest_cells_expr
    directly (not only via the e09 family oracle hashes) over the FULL
    embeddings fixture, a zero-norm vector, and adversarial tie /
    half-up-boundary vectors — the numpy sign*floor(|x|*1e6+0.5)
    emulation of Spark's HALF_UP round must agree element-for-element
    with the Column form at every top_n position."""
    import numpy as np

    from sparkall_spark.operators import similarity as S

    cents = np.random.default_rng(123).standard_normal((16, 64))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    extra = [
        (100_000, [0.0] * dim),                  # zero-norm
        (100_001, list(cents[3] / np.linalg.norm(cents[3]))),  # exact hit
        (100_002, list(-cents[7])),              # exact anti-hit
        (100_003, [1.0] + [0.0] * (dim - 1)),    # axis vector
    ]
    probe = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in extra],
            "vec_id bigint, embedding array<double>",
        )
    )
    for top_n in (1, 4):
        got = (
            probe.select(
                "vec_id",
                S.nearest_cells_arrow("embedding", cents, top_n).alias("a"),
                S.nearest_cells_expr(
                    F.col("embedding"), cents, top_n
                ).alias("e"),
            )
            .collect()
        )
        assert len(got) == emb.count() + len(extra)
        for r in got:
            assert list(r["a"]) == list(r["e"]), (top_n, r["vec_id"])


def test_mean_pool_vectors_exact_and_sql_mirrored(spark, duck, sf_dir):
    from sparkall_spark.operators.projection import mean_pool_vectors

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "grp", F.col("vec_id") % 7
    )
    got = {
        r["grp"]: (r["n_pooled"], [round(x, 9) for x in r["embedding"]])
        for r in mean_pool_vectors(emb, "grp").collect()
    }
    mirror = {
        g: (n, [round(x, 9) for x in v])
        for g, n, v in duck.execute(
            """
            WITH flat AS (
              SELECT vec_id % 7 AS grp, unnest(e) AS x,
                     unnest(range(1, len(e) + 1)) AS i
              FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)),
            per AS (SELECT grp, i, avg(x) AS m, count(*) AS n
                    FROM flat GROUP BY 1, 2)
            SELECT grp, max(n), list(m ORDER BY i) FROM per GROUP BY grp
            """
        ).fetchall()
    }
    assert set(got) == set(mirror)
    for g in got:
        assert got[g][0] == mirror[g][0]
        assert all(
            abs(a - b) < 1e-9 for a, b in zip(got[g][1], mirror[g][1])
        ), g
    # normalized variant has unit norm
    import math

    for r in mean_pool_vectors(emb, "grp", l2_normalize=True).collect():
        assert math.isclose(
            sum(x * x for x in r["embedding"]), 1.0, rel_tol=1e-9
        )


def test_mean_pool_vectors_nulls_and_ragged(spark):
    from sparkall_spark.operators.projection import mean_pool_vectors

    df = spark.createDataFrame(
        [(1, [1.0, 3.0]), (1, [3.0, 5.0]), (1, None), (2, [2.0, 2.0])],
        "g bigint, embedding array<double>",
    )
    got = {
        r["g"]: (r["n_pooled"], list(r["embedding"]))
        for r in mean_pool_vectors(df, "g").collect()
    }
    assert got == {1: (2, [2.0, 4.0]), 2: (1, [2.0, 2.0])}
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [1.0])], "g bigint, embedding array<double>"
    )
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        mean_pool_vectors(ragged, "g").collect()


def test_mean_pool_vectors_empty_vectors_dropped(spark):
    """Zero-length vectors carry no elements to pool — dropped like
    NULLs (an empty array vanishes in posexplode, so it must not count
    toward n_pooled nor dodge the ragged check by mixing silently)."""
    from sparkall_spark.operators.projection import mean_pool_vectors

    df = spark.createDataFrame(
        [(1, [1.0, 3.0]), (1, []), (2, []), (2, None)],
        "g bigint, embedding array<double>",
    )
    got = {
        r["g"]: (r["n_pooled"], list(r["embedding"]))
        for r in mean_pool_vectors(df, "g").collect()
    }
    assert got == {1: (1, [1.0, 3.0])}


def test_ann_recall_report_counts_and_zero_rows(spark):
    import pytest as _pytest

    from sparkall_spark.operators.similarity import ann_recall_report

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 11), (1, 99), (1, 12), (2, 77), (2, 78), (2, 79)],
        "query_id long, neighbor_id long",
    )
    got = {
        r["query_id"]: (r["n_overlap"], r["recall"])
        for r in ann_recall_report(approx, exact, k=3).collect()
    }
    assert got == {1: (2, round(2 / 3, 6)), 2: (0, 0.0)}
    with _pytest.raises(ValueError, match="positive"):
        ann_recall_report(approx, exact, k=0)
    # batched (method_col) mode: one plan scores every tagged method,
    # zero-filling (method, query) combos the method missed entirely
    tagged = spark.createDataFrame(
        [("a", 1, 11), ("a", 1, 99), ("a", 1, 12), ("a", 2, 77),
         ("b", 1, 10), ("b", 2, 20), ("b", 2, 21)],
        "method string, query_id long, neighbor_id long",
    )
    got2 = {
        (r["method"], r["query_id"]): (r["n_overlap"], r["recall"])
        for r in ann_recall_report(
            tagged, exact, k=3, method_col="method"
        ).collect()
    }
    assert got2 == {
        ("a", 1): (2, round(2 / 3, 6)), ("a", 2): (0, 0.0),
        ("b", 1): (1, round(1 / 3, 6)), ("b", 2): (2, round(2 / 3, 6)),
    }


def test_ann_recall_report_dupes_and_short_exact(spark):
    """r10-advice hardening: duplicate (query, neighbor) rows in either
    input must not inflate n_overlap, and a query whose exact baseline
    holds fewer than k rows is scored against that count (so a perfect
    approximation reaches recall 1, never 2/k-capped < 1)."""
    from sparkall_spark.operators.similarity import ann_recall_report

    # query 1: exact has only 2 rows (< k=3); approx finds both ->
    # recall must be 1.0, not 2/3.  Dupes on both sides are noise.
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 11), (2, 20), (2, 21), (2, 22)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11), (2, 20), (2, 20), (2, 20)],
        "query_id long, neighbor_id long",
    )
    got = {
        r["query_id"]: (r["n_overlap"], r["recall"])
        for r in ann_recall_report(approx, exact, k=3).collect()
    }
    assert got == {1: (2, 1.0), 2: (1, round(1 / 3, 6))}


def test_ann_recall_report_overlap_capped_at_k(spark):
    """r11-advice hardening: a MALFORMED exact frame carrying more
    than k rows per query must not yield recall > 1.0 — n_overlap is
    capped at least(overlap, k) (on well-formed k-per-query inputs the
    cap is an identity, pinned by the other recall tests)."""
    from sparkall_spark.operators.similarity import ann_recall_report

    # exact holds 4 distinct rows for query 1 though k=2; approx
    # matches all 4 -> raw overlap 4, capped to k=2, recall exactly 1
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (1, 13)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (1, 13)],
        "query_id long, neighbor_id long",
    )
    got = {
        r["query_id"]: (r["n_overlap"], r["recall"])
        for r in ann_recall_report(approx, exact, k=2).collect()
    }
    assert got == {1: (2, 1.0)}
