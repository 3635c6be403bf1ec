"""Int8 scalar quantization for embedding storage (extension; no
reference analog — the reference has no vector surface at all).

The 100 TB lever: an embedding column of ``array<float>`` dominates a
multimodal table's bytes (a 768-dim float32 vector is 3 KB/row; 100 TB
of corpus text easily carries tens of TB of vectors).  Symmetric
per-vector int8 quantization stores the same vector as
``array<tinyint>`` + one double scale — 4x smaller scans, 4x more
vectors per executor for ANN probes — while cosine similarity is
preserved to ~1e-2 (and, crucially for this repo's gates, becomes
EXACTLY reproducible cross-engine: the quantized cosine is integer
arithmetic up to one division and one sqrt).

Scheme (the faiss ``SQ8``-style symmetric scalar quantizer, per-vector
absmax scaling as in 8-bit inference kernels — Dettmers et al.,
LLM.int8(), NeurIPS'22):

    scale = max(|v_i|) / 127
    q_i   = floor(v_i / scale + 0.5)   in [-127, 127]

``floor(x + 0.5)`` — NOT engine ``round()`` — is the determinism
choice: both engines evaluate it with the same IEEE ops bit-for-bit,
sidestepping the Spark-HALF_UP-vs-DuckDB-banker's divergence at .5
boundaries documented for bm25's exact_micro.  Zero vectors get
scale 0 and all-zero codes.

Cosine invariance: cos(q_a * s_a, q_b * s_b) = idot(q_a, q_b) /
(||q_a|| * ||q_b||) — the scales cancel, so quantized cosine needs NO
dequantization and its numerator/norms are exact int64 sums (bounded
by 127^2 * dim << 2^53, so even a double-based engine computes them
exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _absmax(v: Column) -> Column:
    return F.array_max(F.transform(v, lambda x: F.abs(x)))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Attach the int8 codes (``array<tinyint>``) and per-vector scale
    (double) for ``vec_col``.  Map-only; NULL vectors pass through as
    NULL codes/scale."""
    v = F.col(vec_col).cast("array<double>")
    mx = _absmax(v)
    scale = mx / F.lit(127.0)
    # guard on the SCALE, not the absmax: a subnormal absmax (< ~1e-322)
    # underflows mx/127 to 0.0 and x/scale would blow up — such vectors
    # quantize to zero codes like true zero vectors (hypothesis-found)
    q_nonzero = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)))
        ).cast("tinyint"),
    )
    q_zero = F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    return df.withColumn(
        qvec_col, F.when(scale > 0, q_nonzero).otherwise(q_zero)
    ).withColumn(
        # NULL vectors keep NULL scale (the qvec when() already yields
        # NULL for them since both branches evaluate over a NULL array)
        scale_col,
        F.when(scale > 0, scale).when(v.isNotNull(), F.lit(0.0)),
    )


def dequantize_expr(qvec: Column | str, scale: Column | str) -> Column:
    """``array<double>`` reconstruction ``q_i * scale`` (max error
    scale/2 per component)."""
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    s = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(q, lambda x: x.cast("double") * s)


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two int8 code arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine of the ORIGINAL vectors up to quantization error, from
    codes alone (scales cancel); 6dp rounded.  Zero codes -> 0.0."""
    num = int_dot(qa, qb).cast("double")
    na = int_dot(qa, qa).cast("double")
    nb = int_dot(qb, qb).cast("double")
    return F.round(
        F.when((na > 0) & (nb > 0), num / F.sqrt(na * nb)).otherwise(0.0), 6
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
    corpus_code_col: str | None = None,
) -> DataFrame:
    """Exact top-k under the QUANTIZED metric: brute-force cosine over
    int8 codes (same shape/contract as ``similarity.brute_force_topk``
    — broadcast queries, corpus streams, ties to lower neighbor_id).
    Output: query_id, neighbor_id, cosine (the quantized cosine,
    6dp), rank.

    This is the storage-bound ANN baseline: the corpus-side working
    set is dim bytes + 8 per vector instead of 8*dim, so a scan-heavy
    shortlist pass fits 4-8x more vectors per executor.  Compose with
    an exact refine over the float column for recall-critical use (the
    IVF-PQ leg's pattern).

    ``corpus_code_col`` (r13): name of a PRECOMPUTED
    :func:`quantize_embeddings` code column on ``corpus`` — callers
    running several quantized methods over one corpus (the e09 family)
    quantize once in a shared persisted frame instead of once per
    method (guide §5)."""
    q = quantize_embeddings(
        queries.select(
            F.col(query_id_col or id_col).alias("query_id"),
            F.col(query_vec_col or vec_col).alias("__v"),
        ),
        "__v",
        "__qq",
        "__qs",
    ).select("query_id", "__qq")
    if corpus_code_col:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(corpus_code_col).alias("__cq"),
        )
    else:
        c = quantize_embeddings(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("__v"),
            ),
            "__v",
            "__cq",
            "__cs",
        ).select("neighbor_id", "__cq")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", quantized_cosine(F.col("__cq"), F.col("__qq"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_sql(vec_sql: str) -> str:
    """DuckDB rendering of the code array for ``vec_sql`` (a DOUBLE[]
    expression) — the same absmax/127 scale and floor(x/s + 0.5)
    arithmetic, for oracle-side verification."""
    mx = f"list_max(list_transform({vec_sql}, x -> abs(x)))"
    return (
        f"CASE WHEN {mx} / 127.0 > 0 THEN list_transform({vec_sql}, "
        f"x -> greatest(-127, least(127, "
        f"floor(x / ({mx} / 127.0) + 0.5))))::BIGINT[] "
        f"ELSE list_transform({vec_sql}, x -> 0::BIGINT) END"
    )


def ivf_topk_q8(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_code_col: str | None = None,
    corpus_cell_col: str | None = None,
) -> DataFrame:
    """IVF cells + int8 scoring: the composed memory-bound ANN shape —
    the searchable per-corpus-vector payload is ONE int cell + dim code
    bytes (vs 8*dim float bytes), cells bound the candidate set, and
    the shortlist scores with the quantized cosine (scales cancel, so
    no dequantization on the hot path).

    ``centroids`` (n_cells x dim numpy) must be provided — the same
    fixed-codebook determinism contract as ``similarity.ivf_topk``'s
    oracle mode; cell assignment uses the FLOAT vectors once at index
    time (the Arrow matmul), queries probe their ``nprobe`` nearest
    cells.  Output: query_id, neighbor_id, cosine (quantized, 6dp),
    rank — exactly ``quantized_topk`` restricted to the probed cells
    (asserted in tests).  Compose with a float refine for
    recall-critical use (the IVF-PQ pattern).

    ``corpus_code_col`` / ``corpus_cell_col`` (r13): precomputed
    :func:`quantize_embeddings` codes and ``assign_cells`` (SAME
    centroids) columns on ``corpus`` — the e09 shared-base contract
    (guide §5): one persisted corpus frame feeds every method instead
    of each method re-deriving its index columns.
    """
    import numpy as np

    from sparkall_spark.operators.similarity import (
        assign_cells,
        nearest_cells_arrow,
    )

    cents = np.asarray(centroids, dtype=float)
    if corpus_code_col and corpus_cell_col:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(corpus_code_col).alias("__cq"),
            F.col(corpus_cell_col).alias("cell"),
        )
    elif corpus_code_col or corpus_cell_col:
        raise ValueError(
            "pass corpus_code_col and corpus_cell_col together, or neither"
        )
    else:
        c = quantize_embeddings(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).cast("array<double>").alias("__v"),
            ),
            "__v",
            "__cq",
            "__cs",
        ).select(
            "neighbor_id",
            "__cq",
            assign_cells(F.col("__v"), cents).alias("cell"),
        )
    q = quantize_embeddings(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        ),
        "__v",
        "__qq",
        "__qs",
    ).select(
        "query_id",
        "__qq",
        F.explode(
            nearest_cells_arrow(F.col("__v"), cents, nprobe)
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", quantized_cosine(F.col("__cq"), F.col("__qq")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
