"""Similarity search over embedding columns (array<float>).

Two paths (extension — no reference analog):

- :func:`brute_force_topk` — exact cosine top-k: broadcast the query
  set, JVM-side dot products via zip_with/aggregate, per-query top-k
  with a rank window.  The correctness baseline; also the right answer
  whenever |queries| is small (the common retrieval shape).
- :func:`lsh_topk` — random-hyperplane (sign) LSH bucketing: corpus and
  queries are hashed into buckets; candidates come from an equi-join on
  bucket id, then exact rescoring.  Probe multiple hash tables for
  recall.  The 100 TB path: shuffle keys are small ints, the all-pairs
  product never materializes.
- :func:`ivf_topk` — IVF-style: k-means-lite centroids (sampled, fixed
  iterations, deterministic) assign each vector to a cell; queries probe
  the ``nprobe`` nearest cells.

Pairwise vector math (dot products, norms, cosine rescoring) is
Column-expression based (zip_with + aggregate).  The one exception is
LSH bucket assignment, which is a matrix multiply against all
tables*bits hyperplanes at once — that ships as an Arrow-batched
Pandas UDF (:func:`bucket_ids`), since evaluating it through
interpreted higher-order functions costs seconds per thousand rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _as_double(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__qid" if False else "__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )


def _paired_cosine() -> Column:
    """Cosine from precomputed per-side norms (__qn/__cn) — avoids
    recomputing both norms for every candidate pair (O(pairs*dim) saved;
    norms are O(rows*dim) once)."""
    denom = F.col("__qn") * F.col("__cn")
    return F.round(
        F.when(denom > 0, dot(F.col("__qv"), F.col("__cv")) / denom).otherwise(0.0), 6
    )


def train_centroids(
    sample: np.ndarray, n_cells: int, iters: int, seed: int
) -> np.ndarray:
    """Driver-side cosine k-means over a BOUNDED sample (metadata-scale:
    O(sample * n_cells * iters), independent of corpus size).  Shared by
    the IVF family and :func:`~sparkall_spark.operators.dedup.semdedup`."""
    rng = np.random.default_rng(seed)
    cents = sample[
        rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    ].astype(float)
    for _ in range(iters):
        d = sample @ cents.T
        norms = np.linalg.norm(sample, axis=1, keepdims=True) * np.linalg.norm(
            cents, axis=1
        )
        assign = np.argmax(
            np.divide(d, norms, out=np.zeros_like(d), where=norms > 0), axis=1
        )
        for j in range(len(cents)):
            members = sample[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def assign_cells(vec: Column, cents: np.ndarray) -> Column:
    """Arrow-batched nearest-centroid id (the scale path for top-1 cell
    assignment): one ``batch x cells`` matrix multiply per Arrow batch
    instead of an interpreted higher-order fold per row — the same
    reasoning as :func:`bucket_ids` (the HOF evaluation costs ~1 ms/row
    at dim=64/cells=8; the matmul is ~1 µs/row).

    Semantics match :func:`nearest_cells_expr`'s top-1 element and its
    SQL mirrors bit-for-bit up to the already-accepted last-ulp class:
    cosines are rounded HALF-UP at 6dp (emulated with
    sign*floor(|x|*1e6+0.5)) and ties break toward the HIGHER cell id;
    zero-norm vectors score 0 against every centroid and land in the
    highest cell, exactly like the reverse(array_sort) order."""
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(cents, dtype=np.float64)
    cn = np.linalg.norm(c, axis=1)
    n_cells = c.shape[0]

    @pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(x, dtype=np.float64) for x in vs])
        d = m @ c.T
        denom = np.linalg.norm(m, axis=1)[:, None] * cn[None, :]
        cos = np.divide(d, denom, out=np.zeros_like(d), where=denom > 0)
        r = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)
        # argmax over reversed cell order -> ties to the higher cell id
        idx = np.argmax(r[:, ::-1], axis=1)
        return pd.Series((n_cells - 1) - idx, dtype="int32")

    return _assign(vec)


def nearest_cells_arrow(vec: Column, cents: np.ndarray, top_n: int) -> Column:
    """Arrow-batched array of the ``top_n`` nearest centroid ids —
    value-identical to :func:`nearest_cells_expr` (half-up 6dp rounding,
    ties toward the higher cell id via a composite sort key) but
    without its hidden cost: the Column form builds a
    16-centroids x 64-literals expression tree whose ANALYSIS and
    OPTIMIZATION alone take seconds of driver time per query
    compilation (measured ~3s for an 8-row query side — planning, not
    execution).  The matmul path is microseconds per row and a
    constant-size task closure."""
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(cents, dtype=np.float64)
    cn = np.linalg.norm(c, axis=1)
    n_cells = c.shape[0]

    @pandas_udf("array<int>")
    def _cells(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        m = np.stack([np.asarray(x, dtype=np.float64) for x in vs])
        d = m @ c.T
        denom = np.linalg.norm(m, axis=1)[:, None] * cn[None, :]
        cos = np.divide(d, denom, out=np.zeros_like(d), where=denom > 0)
        r = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)
        # composite key: micro-rounded score primary, cell id secondary
        # (higher cell wins ties) — r*n_cells+cell stays exact in f64
        comp = r * n_cells + np.arange(n_cells)[None, :]
        idx = np.argsort(-comp, axis=1, kind="stable")[:, :top_n]
        return pd.Series(list(idx.astype("int32")))

    return _cells(vec)


def nearest_cells_expr(vec: Column, cents: np.ndarray, top_n: int) -> Column:
    """Array of the ``top_n`` nearest centroid ids (JVM-side Column
    expression over literal centroids).  Cosines are rounded to 6dp —
    coarse enough that a last-ulp difference between engines can't flip
    the argmax in a SQL mirror; ties break toward the higher cell id
    (the reverse(array_sort(structs)) order, mirrored by DuckDB's
    list_reverse(list_sort(...))).  NB: prefer :func:`nearest_cells_arrow`
    on any hot path — this expression's driver-side planning cost is
    seconds (see there)."""
    sims = F.array(
        *[
            F.struct(
                F.round(
                    cosine_similarity(
                        vec, F.array(*[F.lit(float(x)) for x in cent])
                    ),
                    6,
                ).alias("s"),
                F.lit(j).alias("cell"),
            )
            for j, cent in enumerate(cents)
        ]
    )
    ordered = F.reverse(F.array_sort(sims))
    return F.transform(F.slice(ordered, 1, top_n), lambda x: x["cell"])


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
    corpus_norm_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors for every query vector.

    Output: query_id, neighbor_id, cosine (rounded 1e-6), rank.
    Ties broken by neighbor_id (deterministic).  The query side is
    broadcast — it is expected to be small; the corpus streams.
    Norms are computed once per row, not once per pair.

    ``corpus_norm_col`` (r13): name of a PRECOMPUTED ``l2_norm`` column
    on ``corpus`` — callers running several ANN methods over one
    corpus (the e09 family shape) compute the norm once in a shared
    persisted frame instead of once per method (guide §5).  Must have
    been built with :func:`l2_norm` over the cast vector, or results
    differ.
    """
    q = queries.select(
        F.col(query_id_col or id_col).alias("query_id"),
        F.col(query_vec_col or vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        *([F.col(corpus_norm_col).alias("__cn")] if corpus_norm_col else []),
    )
    if not corpus_norm_col:
        c = c.withColumn("__cn", l2_norm(F.col("__cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _paired_cosine())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, table: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed + 7919 * table)
    return rng.standard_normal((bits, dim))


def _bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id for one hash table (bucket = sum_i bit_i<<i):
    JVM-side dot products against literal hyperplanes folded into a
    bigint.

    The planes ship as ONE nested-array literal and fold via
    higher-order functions, keeping the expression tree O(1) in
    bits*dim — the earlier unrolled per-coefficient-literal form made
    Catalyst compile megabyte-scale codegen units (~7 s planning at
    bits=4/tables=16, >60 s at bits=12/tables=48).  Folding MSB-first
    over the *reversed* plane list reproduces the bit_i<<i encoding
    exactly, and ``dot(vec, plane)`` keeps the original operand and
    summation order, so bucket ids stay bit-identical to the SQL
    oracles that embed the same literals."""
    rev = [[float(x) for x in row] for row in reversed(planes)]

    def step(acc: Column, plane: Column) -> Column:
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        return acc * F.lit(2).cast("bigint") + bit

    return F.aggregate(F.lit(rev), F.lit(0).cast("bigint"), step)


def bucket_ids(
    vec: Column, dim: int, bits: int, tables: int, seed: int
) -> Column:
    """All per-table sign-LSH bucket ids for ``vec``, as array<bigint>
    indexed by table (pair with :func:`F.posexplode` to get (tbl, bkt)
    band entries).

    Arrow-vectorized: one numpy matmul per batch computes every
    (table, bit) dot product at once.  The Column-expression form
    (:func:`_bucket_expr`) evaluates the same dots one boxed element at
    a time through interpreted higher-order functions — ~4 s per 2k
    rows of dim 64 at bits=12/tables=48, where the matmul takes
    milliseconds; this is the legitimate Pandas-UDF case (no built-in
    expresses a matrix multiply).  Bucket ids match ``_bucket_expr``
    bit-for-bit except on dots within float-summation-order distance of
    zero (measure-zero for continuous data; asserted equal on the test
    fixtures in tests/test_similarity.py).  Rows whose vector is null
    or not ``dim`` long land in bucket 0 of every table, matching the
    expression path's null-propagation.
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.stack([_hyperplanes(dim, bits, t, seed) for t in range(tables)])
    weight_t = planes.reshape(tables * bits, dim).T.copy()
    bit_weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf("array<long>")
    def _all_buckets(vs: pd.Series) -> pd.Series:
        res: list = [None] * len(vs)
        good_idx: list[int] = []
        good_vecs: list = []
        for i, v in enumerate(vs):
            if v is not None and len(v) == dim:
                good_idx.append(i)
                good_vecs.append(v)
            else:
                res[i] = [0] * tables
        if good_vecs:
            mat = np.asarray(good_vecs, dtype=np.float64)
            sgn = (mat @ weight_t) >= 0
            ids = sgn.reshape(len(good_vecs), tables, bits) @ bit_weights
            for j, i in enumerate(good_idx):
                res[i] = ids[j].tolist()
        return pd.Series(res)

    return _all_buckets(vec)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    corpus_norm_col: str | None = None,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Each vector lands in ``tables`` buckets (one per hash table);
    query/corpus candidates join on (table, bucket) and are rescored
    exactly.  Recall grows with ``tables``; cost per table is one
    equi-join keyed on a small int.  Output schema matches
    :func:`brute_force_topk`.  ``corpus_norm_col``: precomputed
    ``l2_norm`` column on ``corpus`` (the shared-base contract of
    :func:`brute_force_topk`).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        *([F.col(corpus_norm_col).alias("__cn")] if corpus_norm_col else []),
    )
    if not corpus_norm_col:
        c = c.withColumn("__cn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))

    def banded(df: DataFrame, vcol: str) -> DataFrame:
        return df.select(
            *df.columns,
            F.posexplode(bucket_ids(F.col(vcol), dim, bits, tables, seed)).alias(
                "tbl", "bkt"
            ),
        )

    cb = banded(c, "__cv")
    qb = banded(q, "__qv")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "__qv", "__qn", "neighbor_id", "__cv", "__cn")
        .distinct()
    )
    scored = cand.withColumn("cosine", _paired_cosine())
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    iters: int = 5,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    assign: str = "arrow",
    corpus_cell_col: str | None = None,
    corpus_norm_col: str | None = None,
) -> DataFrame:
    """IVF-style ANN: centroids from a driver-side k-means over a bounded
    sample (metadata-scale), then cell-blocked exact search.

    ``corpus_cell_col`` / ``corpus_norm_col`` (r13): precomputed cell
    (``assign_cells`` over the SAME centroids) and ``l2_norm`` columns
    on ``corpus``, for callers sharing one persisted corpus frame
    across several ANN methods (guide §5 — e09 computes the cell
    assignment's Arrow matmul once instead of once per IVF-family
    method).  Only valid with caller-fixed ``centroids``.

    The sample/centroid step is O(sample_size * n_cells * iters) on the
    driver — independent of corpus size; assignment and search are
    distributed equi-joins on cell id.  Pass ``centroids`` (n_cells x
    dim) to skip the k-means and use a fixed, caller-chosen codebook —
    that makes the whole query deterministic and SQL-mirrorable (the
    driver's oracle check uses this).

    ``assign`` picks the corpus-side cell assignment: ``"arrow"``
    (default) is the batched-matmul scale path (:func:`assign_cells`,
    same rounding/tie semantics); ``"column"`` keeps the pure-Column
    fold (UDF-free plan).  Queries always use the Column expression —
    they need the top-``nprobe`` cells and are small by assumption.
    """
    if corpus_cell_col is not None and centroids is None:
        raise ValueError(
            "corpus_cell_col requires caller-fixed centroids (a trained "
            "codebook cannot match a precomputed assignment)"
        )
    extra = [
        F.col(col).alias(name)
        for col, name in (
            (corpus_cell_col, "cell"),
            (corpus_norm_col, "__cn"),
        )
        if col
    ]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        *extra,
    )
    if centroids is not None:
        cents = np.asarray(centroids, dtype=float)
    else:
        sample = np.array(
            [
                r["__cv"]
                for r in c.select("__cv").limit(sample_size).collect()
            ]
        )
        cents = train_centroids(sample, n_cells, iters, seed)

    c_cells = c
    if corpus_cell_col is None:
        if assign == "arrow":
            corpus_cell = assign_cells(F.col("__cv"), cents)
        elif assign == "column":
            corpus_cell = F.element_at(
                nearest_cells_expr(F.col("__cv"), cents, 1), 1
            )
        else:
            raise ValueError(
                f"assign must be 'arrow' or 'column', got {assign!r}"
            )
        c_cells = c_cells.withColumn("cell", corpus_cell)
    if corpus_norm_col is None:
        c_cells = c_cells.withColumn("__cn", l2_norm(F.col("__cv")))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        )
        # arrow probe-cell computation: value-identical to the Column
        # expression but without its seconds-of-driver-planning cost
        # (see nearest_cells_arrow)
        .withColumn("cell", F.explode(nearest_cells_arrow(F.col("__qv"), cents, nprobe)))
        .withColumn("__qn", l2_norm(F.col("__qv")))
    )

    scored = (
        c_cells.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _paired_cosine())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------
# IVF-PQ: product-quantized fine search inside IVF cells (r4)
# --------------------------------------------------------------------

def train_pq_codebooks(
    sample: np.ndarray, m: int, ks: int, iters: int, seed: int
) -> np.ndarray:
    """Per-subspace k-means codebooks: (m, ks, dim//m).

    Lloyd iterations over a driver-bounded sample — O(|sample|*ks*iters)
    per subspace, independent of corpus size (same contract as the IVF
    centroid step)."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, d))
    for j in range(m):
        sub = sample[:, j * d : (j + 1) * d]
        cents = sub[rng.choice(n, size=min(ks, n), replace=False)].astype(float)
        if len(cents) < ks:  # degenerate tiny sample: pad by repetition
            cents = np.resize(cents, (ks, d))
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ks):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(vec: Column, books: np.ndarray) -> Column:
    """PQ code array<int> of length m for a vector column.

    Arrow-vectorized per batch: one (rows x ks) distance matrix per
    subspace — the same legitimate-Pandas-UDF case as bucket_ids (no
    built-in expresses a matmul).  Null / wrong-dim rows encode NULL."""
    from pyspark.sql.functions import pandas_udf

    m, ks, d = books.shape
    dim = m * d
    bt = books  # capture

    @pandas_udf("array<int>")
    def _encode(vs: pd.Series) -> pd.Series:
        res: list = [None] * len(vs)
        good_idx, good_vecs = [], []
        for i, v in enumerate(vs):
            if v is not None and len(v) == dim:
                good_idx.append(i)
                good_vecs.append(v)
        if good_vecs:
            mat = np.asarray(good_vecs, dtype=np.float64)
            codes = np.empty((len(good_vecs), m), dtype=np.int64)
            for j in range(m):
                sub = mat[:, j * d : (j + 1) * d]
                d2 = ((sub[:, None, :] - bt[j][None, :, :]) ** 2).sum(axis=2)
                # quantize at 1e-6 before the argmin (same accepted
                # rounding class as assign_cells): a last-ulp distance
                # difference between engines cannot flip the chosen
                # code, so a SQL mirror with literal codebooks agrees
                # bit-for-bit; ties go to the LOWER code (np.argmin)
                codes[:, j] = np.floor(d2 * 1e6 + 0.5).argmin(axis=1)
            for r, i in enumerate(good_idx):
                res[i] = codes[r].tolist()
        return pd.Series(res)

    return _encode(vec)


def _pq_approx_dot(qv: Column, code: Column, books: np.ndarray) -> Column:
    """Asymmetric distance: dot(query, reconstruction(code)) via the
    per-batch lookup  sum_j books[j][code_j] . q_sub_j  (vectorized)."""
    from pyspark.sql.functions import pandas_udf

    m, ks, d = books.shape
    bt = books

    @pandas_udf("double")
    def _score(qvs: pd.Series, codes: pd.Series) -> pd.Series:
        out = np.full(len(qvs), np.nan)
        good = [
            i
            for i in range(len(qvs))
            if qvs[i] is not None and codes[i] is not None
        ]
        if good:
            q = np.asarray([qvs[i] for i in good], dtype=np.float64)
            c = np.asarray([codes[i] for i in good], dtype=np.int64)
            acc = np.zeros(len(good))
            for j in range(m):
                sub = q[:, j * d : (j + 1) * d]
                acc += np.einsum("nd,nd->n", sub, bt[j][c[:, j]])
            # HALF-UP 6dp rounding (the assign_cells emulation, matching
            # SQL round()): the approx score only RANKS the shortlist,
            # and rounding makes that ranking engine-portable (ties
            # break by neighbor_id downstream) — same contract as the
            # exact-cosine 6dp rounding everywhere else
            out[good] = np.sign(acc) * np.floor(np.abs(acc) * 1e6 + 0.5) / 1e6
        return pd.Series(out)

    return _score(qv, code)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ks: int = 16,
    refine: int = 4,
    sample_size: int = 2048,
    iters: int = 5,
    seed: int = 42,
    assign: str = "arrow",
    centroids=None,
    codebooks=None,
    corpus_norm_col: str | None = None,
) -> DataFrame:
    """IVF-PQ ANN with exact refinement: coarse IVF cells + product-
    quantized codes for the candidate scoring, then exact cosine over
    the ``refine * k`` best PQ candidates per query.
    ``corpus_norm_col``: precomputed ``l2_norm`` column on ``corpus``
    for the refine stage (the shared-base contract of
    :func:`brute_force_topk`; cells/codes here use their own
    centroids/codebooks and are always computed).

    Pass ``centroids`` ((n_cells, dim)) and ``codebooks`` ((m, ks,
    dim//m)) together for a fixed, fully deterministic, SQL-mirrorable
    index (no sampling/training jobs run); otherwise both train from a
    bounded driver-side sample.

    The 100 TB memory story: a corpus vector is stored for search as
    ONE int cell id + ``m`` small codes (m bytes at ks<=256) instead of
    dim doubles — 64x smaller at dim=64/m=8 — so the searchable index
    for a trillion vectors fits a modest cluster, with the full vectors
    touched only for the tiny refine set (partition-pruned join back).
    All heavy math is Arrow-batched numpy (encode: one distance matrix
    per subspace per batch; scoring: m gather-dot-products per batch);
    candidates never exceed the probed cells.

    Output schema matches the other top-k operators:
    (query_id, neighbor_id, cosine, rank).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        *([F.col(corpus_norm_col).alias("__cn")] if corpus_norm_col else []),
    )
    if centroids is not None and codebooks is not None:
        cents = np.asarray(centroids, dtype=float)
        books = np.asarray(codebooks, dtype=float)
    elif centroids is not None or codebooks is not None:
        raise ValueError("pass centroids and codebooks together, or neither")
    else:
        rows = [r["__cv"] for r in c.select("__cv").limit(sample_size).collect()]
        sample = np.asarray(rows, dtype=np.float64)

        # coarse quantizer: reuse the IVF centroid construction
        cents = train_centroids(sample, n_cells, iters, seed)

        # PQ codebooks over RESIDUAL-free subvectors (plain PQ: simpler
        # and adequate at cosine similarity on normalized-ish data)
        books = train_pq_codebooks(sample, m=m, ks=ks, iters=iters, seed=seed + 1)

    # index: cell id + PQ code per corpus vector (map-side, one pass;
    # arrow = batched-matmul assignment, the scale path)
    if assign == "arrow":
        corpus_cell = assign_cells(F.col("__cv"), cents)
    elif assign == "column":
        corpus_cell = F.element_at(nearest_cells_expr(F.col("__cv"), cents, 1), 1)
    else:
        raise ValueError(f"assign must be 'arrow' or 'column', got {assign!r}")
    indexed = c.withColumn("cell", corpus_cell).withColumn(
        "__code", pq_encode(F.col("__cv"), books)
    )

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        )
        # arrow probe cells: same values, none of the Column form's
        # driver-planning cost (see nearest_cells_arrow)
        .withColumn("cell", F.explode(nearest_cells_arrow(F.col("__qv"), cents, nprobe)))
        .withColumn("__qn", l2_norm(F.col("__qv")))
    )

    # candidate scoring on CODES only (the full corpus vector is not in
    # the candidate row — this is what shrinks the searchable index;
    # the precomputed norm rides only the refine join below)
    cand = (
        indexed.drop("__cv", *(["__cn"] if corpus_norm_col else []))
        .join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "__approx", _pq_approx_dot(F.col("__qv"), F.col("__code"), books)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__approx").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("__prank", F.row_number().over(w))
        .filter(F.col("__prank") <= refine * k)
        .select("query_id", "neighbor_id", "__qv", "__qn")
    )

    # exact refine: join the full vectors back for the shortlist only
    refined = shortlist.join(c, "neighbor_id")
    if not corpus_norm_col:
        refined = refined.withColumn("__cn", l2_norm(F.col("__cv")))
    refined = refined.withColumn("cosine", _paired_cosine())
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_recall_report(
    approx: DataFrame, exact: DataFrame, k: int, method_col: str | None = None
) -> DataFrame:
    """Recall@k of an approximate top-k against the exact baseline —
    the tuning telemetry every ANN deployment runs ("measure, don't
    guess"): sample queries, run both paths, read recall before
    touching nprobe/bits/tables.

    Inputs are two ``(query_id, neighbor_id, ...)`` top-k frames (the
    contract every ``*_topk`` here emits).  Output: one row per query
    in ``exact`` — ``query_id, n_overlap`` (|approx ∩ exact| as DISTINCT
    pairs, bigint) and ``recall`` (n_overlap / min(k, per-query exact
    rows), 6dp).  Queries the approximate path missed entirely still
    appear with recall 0.  Both inputs are deduplicated on
    ``(query_id, neighbor_id)`` before matching (so duplicate rows
    cannot inflate the overlap), ``n_overlap`` is additionally capped
    at ``least(overlap, k)`` (so even a malformed exact frame carrying
    MORE than k rows per query cannot push recall past 1.0 — r11
    advice), and the denominator is capped by what the exact baseline
    actually returned, so a query whose corpus is smaller than k (or
    filtered) can still reach recall 1 (r10 advice — with well-formed
    k-rows-per-query inputs all three adjustments are identities).

    ``method_col``: when ``approx`` is a TAGGED UNION of several
    methods' top-k frames (the e09 family shape), name the tag column
    and every method is scored through ONE join + ONE groupBy instead
    of a plan per method — on tiny telemetry frames the per-stage
    scheduling overhead dominates, so batching is ~Nx cheaper.  Output
    gains the ``method_col`` column; a method absent from ``approx``
    entirely (zero rows) is not reported.

    Scale shape: both inputs are k rows per sampled query (bounded) —
    one equi-join + one groupBy on frames that are tiny by
    construction.  Deterministic given deterministic top-k ties, so it
    mirrors in SQL (the e09 oracle's recall legs).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    group = ([method_col] if method_col else []) + ["query_id"]
    approx_keys = approx.select(*group, "neighbor_id").distinct()
    exact_keys = exact.select("query_id", "neighbor_id").distinct()
    hits = (
        exact_keys.join(approx_keys, ["query_id", "neighbor_id"])
        .groupBy(*group)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    # per-query denominator: the exact baseline may legitimately hold
    # fewer than k rows (corpus < k, filtered queries) — recall is
    # measured against what exact COULD return, capped at k
    base = exact_keys.groupBy("query_id").agg(
        F.least(F.count(F.lit(1)), F.lit(k)).alias("__denom")
    )
    if method_col:
        base = base.crossJoin(
            F.broadcast(approx.select(method_col).distinct())
        )
    capped = F.least(
        F.coalesce(F.col("n_overlap"), F.lit(0).cast("bigint")),
        F.lit(k).cast("bigint"),
    )
    return (
        base.join(hits, group, "left")
        .select(
            *group,
            capped.cast("bigint").alias("n_overlap"),
            F.round(
                capped.cast("double") / F.col("__denom").cast("double"),
                6,
            ).alias("recall"),
        )
    )
