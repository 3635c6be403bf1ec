"""Random-projection dimensionality reduction (Johnson–Lindenstrauss).

Achlioptas's database-friendly sparse projection (Achlioptas 2001,
"Database-friendly random projections"): entries of the k x d projection
matrix are drawn from {+1, 0, -1} with probabilities {1/6, 2/3, 1/6}, so
each output coordinate is a SIGNED SUBSET SUM of input coordinates —
no float matrix multiply, and 2/3 of the terms vanish.  With the
sqrt(3/k) scale the projection preserves pairwise distances to (1 ± eps)
for k = O(log n / eps^2), which is what downstream k-means
(`operators.clustering`) and ANN search (`operators.similarity`) need
from a narrower vector.

Exactness design (same micro-unit trick as ``operators.lm``): inputs are
quantized once to integer MICROS (``round(x * 1e6)`` as BIGINT), so each
output coordinate is an exact integer sum — associative, order-free, and
bit-identical in any engine — rather than an IEEE float fold whose value
depends on summation order.  The quantization error (<= 0.5e-6 per
element, so <= d/2 micros per output) is orders of magnitude below the
JL distortion eps the projection already accepts.  The optional scaled
form applies ``* sqrt(3/k) / 1e6`` as ONE float op per coordinate from
identical integers — still engine-exact.

Scale: the whole operator is a map-only Column expression (no UDF, no
shuffle); the signed index sets are driver-side literals baked into the
plan, ~d/3 ``element_at`` integer adds per output coordinate inside
whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

MICRO = 1_000_000


def achlioptas_signs(dim: int, k: int, seed: int = 97) -> list[list[int]]:
    """The k x d sign matrix with entries in {+1, 0, -1} at probabilities
    {1/6, 2/3, 1/6}, from a fixed-seed generator (deterministic across
    runs and engines — the matrix is data-independent plan metadata)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    draws = rng.integers(0, 6, size=(k, dim))
    # 0 -> +1, 1..4 -> 0, 5 -> -1  (matches the 1/6, 2/3, 1/6 law)
    return [
        [1 if v == 0 else (-1 if v == 5 else 0) for v in row]
        for row in draws.tolist()
    ]


def _signed_index_sets(
    signs: list[list[int]],
) -> list[tuple[list[int], list[int]]]:
    """Per output coordinate: (1-based +1 indices, 1-based -1 indices)."""
    return [
        (
            [i + 1 for i, s in enumerate(row) if s == 1],
            [i + 1 for i, s in enumerate(row) if s == -1],
        )
        for row in signs
    ]


def micro_quantize(vec: Column | str) -> Column:
    """array<float/double> -> array<bigint> micro units (x 1e6, rounded).
    Precompute this as a real column (``withColumn``) before building the
    projection expression — higher-order/compound expressions re-evaluate
    inline subtrees per reference."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        c, lambda v: F.round(v.cast("double") * MICRO).cast("bigint")
    )


def project_micro(
    micro_vec: Column | str, signs: list[list[int]]
) -> Column:
    """array<bigint> micro vector -> array<bigint> of k exact signed
    subset sums (UNscaled micro units).  ``micro_vec`` should be a
    precomputed attribute column (see :func:`micro_quantize`)."""
    c = F.col(micro_vec) if isinstance(micro_vec, str) else micro_vec
    outs = []
    for pos, neg in _signed_index_sets(signs):
        term: Column = F.lit(0).cast("bigint")
        for i in pos:
            term = term + F.element_at(c, i)
        for i in neg:
            term = term - F.element_at(c, i)
        outs.append(term)
    return F.array(*outs)


def scale_projection(proj_micro: Column | str, k: int) -> Column:
    """Micro subset sums -> array<double> JL-scaled coordinates: one
    float multiply per coordinate (sqrt(3/k)/1e6), engine-exact from
    identical integers."""
    c = F.col(proj_micro) if isinstance(proj_micro, str) else proj_micro
    factor = math.sqrt(3.0 / k) / MICRO
    return F.transform(c, lambda v: v.cast("double") * F.lit(factor))


def random_project(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
    seed: int = 97,
    out_col: str = "proj_micro",
    scaled_col: str | None = None,
) -> DataFrame:
    """Append the Achlioptas random projection of ``vec_col`` as
    ``out_col`` (array<bigint> exact micro sums) and, optionally, the
    JL-scaled double form as ``scaled_col``."""
    signs = achlioptas_signs(dim, k, seed)
    out = df.withColumn("__mv", micro_quantize(vec_col)).withColumn(
        out_col, project_micro("__mv", signs)
    )
    if scaled_col is not None:
        out = out.withColumn(scaled_col, scale_projection(out_col, k))
    return out.drop("__mv")


def project_micro_sql(
    vec_expr: str, dim: int, k: int, seed: int = 97
) -> str:
    """DuckDB mirror of :func:`micro_quantize` + :func:`project_micro`
    as one list expression over ``vec_expr`` — identical sign matrix
    (same seed), identical integer arithmetic."""
    signs = achlioptas_signs(dim, k, seed)
    mv = (
        f"list_transform({vec_expr}, "
        f"v -> round(v::DOUBLE * {MICRO})::BIGINT)"
    )
    coords = []
    for pos, neg in _signed_index_sets(signs):
        terms = [f"mv[{i}]" for i in pos] + [f"-mv[{i}]" for i in neg]
        coords.append(" + ".join(terms).replace("+ -", "- ") or "0::BIGINT")
    body = ", ".join(coords)
    # lambda binds mv once per row so the quantization isn't re-run per
    # coordinate term
    return f"list_transform([{mv}], mv -> [{body}])[1]"


def mean_pool_vectors(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    out_col: str = "embedding",
    l2_normalize: bool = False,
) -> DataFrame:
    """Element-wise mean of the group's vectors — the standard
    chunk-embeddings -> document-embedding pooling step.  One map-side-
    combined aggregation (posexplode to (group, dim, value), avg per
    dim, reassemble sorted by position); NULL and zero-length vectors
    are dropped (both carry no elements to pool — an empty array would
    otherwise vanish in posexplode and dodge the ragged check), and
    ragged dimensionalities within a group raise at action time via the
    count check rather than silently zip-truncating.

    ``l2_normalize=True`` rescales the pooled vector to unit norm (the
    usual prep before cosine retrieval).  Output: ``group_col`` +
    ``out_col`` (array<double>) + ``n_pooled`` (bigint).
    """
    base = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(
        F.col(group_col),
        F.size(vec_col).alias("__dim"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "__i", "__x"
        ),
    )
    per_dim = base.groupBy(group_col, "__i").agg(
        F.avg("__x").alias("__m"),
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct("__dim").alias("__dims"),
    )
    pooled = per_dim.groupBy(group_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__i"), F.col("__m")))
        ).alias("__im"),
        F.max("__n").alias("n_pooled"),
        (F.max("__dims") > 1).alias("__ragged"),
    )
    vec = F.transform(F.col("__im"), lambda s: s["__m"])
    out = pooled.select(
        F.col(group_col),
        F.when(
            F.col("__ragged"),
            F.raise_error(
                F.lit("mean_pool_vectors: mixed vector lengths in group")
            ).cast("array<double>"),
        )
        .otherwise(vec)
        .alias(out_col),
        F.col("n_pooled").cast("bigint").alias("n_pooled"),
    )
    if l2_normalize:
        norm = F.sqrt(
            F.aggregate(
                F.transform(F.col(out_col), lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        out = out.withColumn(
            out_col,
            F.when(
                norm > 0,
                F.transform(F.col(out_col), lambda x: x / norm),
            ).otherwise(F.col(out_col)),
        )
    return out
