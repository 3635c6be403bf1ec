"""Distributed k-means (Lloyd) over embedding columns.

`similarity.train_centroids` fits centroids on a BOUNDED driver sample
— the right cost model for seeding IVF cells and SemDeDup, but a
biased sample yields biased cells.  This module adds the full-corpus
refinement: true distributed Lloyd iterations where the DATA never
leaves the executors and only k x dim centroid numbers (metadata
scale) ever reach the driver.

Per iteration:

1. **assign** — nearest centroid per row via the Arrow-batched matmul
   (`similarity.assign_cells`): one `batch x k` multiply per Arrow
   batch, map-side only, centroids shipped in the closure (k x dim
   doubles — broadcast-by-value);
2. **update** — per-cell elementwise mean as ONE `groupBy(cell)` with
   `dim` `avg(vec[i])` aggregates: Catalyst computes map-side partial
   sums/counts, so the shuffle carries k * n_partitions compact rows,
   never vectors; the k result rows are collected (metadata) and
   become the next closure.

Empty cells keep their previous centroid (same rule as
`train_centroids`).  Assignment semantics are exactly
`assign_cells`'s documented contract — cosine rounded HALF-UP at 6dp,
ties to the HIGHER cell id, zero-norm vectors cosine 0.0 against
everything — so every round mirrors in ANSI SQL (the tests unroll
k-step CTE oracles in DuckDB).

100 TB notes: per iteration exactly one shuffle (the partial-agg
exchange, k*partitions rows of dim doubles) and one metadata collect;
assignment is embarrassingly parallel.  Convergence monitoring via the
returned per-round centroid history costs nothing extra.  k is
bounded by closure/plan size (k*dim literals) — thousands of cells are
fine; for k beyond ~10^5 switch the update to an explode-based
(cell, dim_idx) aggregation and the assignment to a block matmul over
a broadcast DataFrame.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from sparkall_spark.operators.similarity import assign_cells, train_centroids


def kmeans_assign(
    df: DataFrame,
    cents: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """``df`` + ``out_col`` = nearest-centroid id (Arrow-batched;
    `assign_cells` semantics: 6dp cosine, ties to higher id)."""
    return df.withColumn(
        out_col, assign_cells(F.col(vec_col).cast("array<double>"), cents)
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 8,
    iters: int = 3,
    seed: int = 42,
    init: np.ndarray | None = None,
    sample_limit: int = 100_000,
    init_iters: int = 0,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Distributed Lloyd k-means: returns ``(centroids, history)``
    where ``history[r]`` is the centroid matrix BEFORE round r (so
    ``history[0]`` is the init and ``centroids == history[-1]`` after
    the last update).

    ``init`` supplies explicit start centroids (k x dim); otherwise a
    bounded sample seeds them via `train_centroids` (``init_iters``
    driver-side rounds — 0 means raw sampled points, the fully
    SQL-mirrorable choice).
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    vecs = df.select(F.col(vec_col).cast("array<double>").alias("__v"))
    if init is not None:
        cents = np.asarray(init, dtype=np.float64)
    else:
        sample = np.array(
            [
                r["__v"]
                for r in vecs.filter(F.size("__v") > 0)
                .limit(sample_limit)
                .collect()
            ],
            dtype=np.float64,
        )
        if len(sample) == 0:
            raise ValueError("no non-empty vectors to initialize from")
        cents = train_centroids(sample, n_cells, init_iters, seed)
    dim = cents.shape[1]

    history = [cents.copy()]
    for _ in range(iters):
        assigned = vecs.withColumn("__cell", assign_cells(F.col("__v"), cents))
        rows = (
            assigned.groupBy("__cell")
            .agg(*[F.avg(F.col("__v")[i]).alias(f"d{i}") for i in range(dim)])
            .collect()  # k rows of dim doubles — metadata scale
        )
        nxt = cents.copy()  # empty cells keep their previous centroid
        for r in rows:
            nxt[r["__cell"]] = [r[f"d{i}"] for i in range(dim)]
        cents = nxt
        history.append(cents.copy())
    return cents, history


def kmeans_assign_oracle_sql(
    init: np.ndarray,
    iters: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """ANSI-SQL mirror of ``kmeans_fit(init=...)`` + ``kmeans_assign``:
    an unrolled Lloyd-round CTE chain ending in the final assignment
    ``(id, cell)``.  Shared by the driver entry and the tests — the
    oracle contract for the distributed k-means path."""
    dim = int(np.asarray(init).shape[1])

    def cos_cte(r: str, cents: str) -> str:
        # assign_cells semantics: 6dp HALF-UP cosine as an integer
        # score, ties to the higher cell id, zero-norm -> 0
        return f"""
a{r} AS (
  SELECT {id_col}, cell,
         CASE WHEN den > 0
              THEN sign(d / den) * floor(abs(d / den) * 1000000 + 0.5)
              ELSE 0 END AS s
  FROM (SELECT e.{id_col}, c.cell,
               list_dot_product(e.emb, c.cent) AS d,
               sqrt(list_dot_product(e.emb, e.emb))
                 * sqrt(list_dot_product(c.cent, c.cent)) AS den
        FROM emb e CROSS JOIN {cents} c) q),
sel{r} AS (
  SELECT {id_col}, cell FROM (
    SELECT {id_col}, cell,
           row_number() OVER (PARTITION BY {id_col}
                              ORDER BY s DESC, cell DESC) AS rn
    FROM a{r}) q
  WHERE rn = 1)"""

    rows = ",\n".join(
        "(%d, [%s])" % (j, ", ".join(repr(float(x)) for x in c))
        for j, c in enumerate(np.asarray(init, dtype=float))
    )
    avgs = ", ".join(f"avg(e.emb[{i + 1}])" for i in range(dim))
    parts = [
        f"WITH emb AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS emb "
        f"FROM {table}),",
        f"c0(cell, cent) AS (VALUES {rows})",
    ]
    for r in range(iters):
        parts.append("," + cos_cte(str(r), f"c{r}"))
        parts.append(f""",
cm{r} AS (
  SELECT s.cell AS cell, [{avgs}] AS cent
  FROM sel{r} s JOIN emb e USING ({id_col}) GROUP BY s.cell),
c{r + 1} AS (
  SELECT p.cell, coalesce(m.cent, p.cent) AS cent
  FROM c{r} p LEFT JOIN cm{r} m USING (cell))""")
    parts.append("," + cos_cte("fin", f"c{iters}"))
    parts.append(f"\nSELECT {id_col}, cell FROM selfin")
    return "".join(parts)


def kmeans_fit_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 8,
    iters: int = 3,
    seed: int = 42,
    init: np.ndarray | None = None,
    out_col: str = "cell",
) -> tuple[DataFrame, np.ndarray]:
    """Fit distributively, then return (assigned df, centroids)."""
    cents, _ = kmeans_fit(
        df, vec_col, n_cells=n_cells, iters=iters, seed=seed, init=init
    )
    return kmeans_assign(df, cents, vec_col, out_col), cents
