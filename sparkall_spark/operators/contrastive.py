"""Contrastive training-pair mining for embedding models.

SimCSE/Contriever-style "independent cropping": a POSITIVE pair is two
disjoint token chunks of the SAME document; a NEGATIVE for an anchor is
a chunk from a different document.  This operator mines all three
deterministically so the pair set is reproducible across runs, engines,
and corpus repartitioning — the same property the split/pack operators
(`operators.sampling`) guarantee for training splits.

Selection law (pure id arithmetic, SQL-mirrorable):

- a document with ``n >= 2`` chunks of ``chunk_tokens`` tokens
  contributes one pair: anchor chunk ``a = id % n``, positive chunk
  ``p = (a + 1 + id % (n-1)) % n`` (the offset lies in [1, n-1], so
  ``p != a`` always);
- its negative is the anchor of the NEXT document (by id) inside the
  same ``id % n_buckets`` bucket, wrapping to the bucket's first — a
  cheap corpus-level shuffle of anchors that never pairs a document
  with itself as long as buckets hold >= 2 documents (choose
  ``n_buckets`` << corpus size; the window is PARTITIONED by bucket,
  so no global sort exists at any scale).

Run AFTER dedup: duplicated documents in one bucket would otherwise
make some negatives verbatim-equal to their anchor (false negatives in
the training sense).  Everything is map-side Column work except the one
bucket-partitioned window; at corpus scale mine negatives on a narrow
``(id, anchor)`` projection and join back by id if rows are wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparkall_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
) -> DataFrame:
    """Explode documents into fixed-size token chunks:
    ``(id_col, chunk_idx, chunk_text, n_chunks)``.  The last chunk may
    be shorter (slice truncates); documents with no tokens vanish.
    Map-side only."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    c = chunk_tokens
    pre = docs.select(
        F.col(id_col), tokens(text_col).alias("__tk")
    ).withColumn(
        "__n",
        F.floor((F.size("__tk") + (c - 1)) / c).cast("int"),
    )
    return (
        pre.filter(F.col("__n") > 0)
        .select(
            id_col,
            "__n",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__n") - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice("__tk", i * c + 1, c)
                    ),
                )
            ),
        )
        .select(
            F.col(id_col),
            F.col("pos").alias("chunk_idx"),
            F.col("col").alias("chunk_text"),
            F.col("__n").cast("bigint").alias("n_chunks"),
        )
    )


def contrastive_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    n_buckets: int = 64,
) -> DataFrame:
    """One ``(id_col, anchor, positive, negative)`` row per document
    with at least two chunks (see module docstring for the law).
    ``negative`` is NULL only for a singleton bucket (bucket with one
    eligible document) — filter those rather than train on them."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    c = chunk_tokens
    pre = docs.select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__tk")
    ).withColumn(
        "__n", F.floor((F.size("__tk") + (c - 1)) / c).cast("int")
    )
    eligible = pre.filter(F.col("__n") >= 2)
    a = F.pmod(F.col("__id"), F.col("__n")).cast("int")
    p = F.pmod(
        a + 1 + F.pmod(F.col("__id"), F.col("__n") - 1), F.col("__n")
    ).cast("int")
    chunk = lambda idx: F.concat_ws(  # noqa: E731  (slice is 1-based)
        " ", F.slice("__tk", idx * c + 1, c)
    )
    paired = eligible.select(
        "__id",
        chunk(a).alias("anchor"),
        chunk(p).alias("positive"),
    )
    w = Window.partitionBy(F.pmod(F.col("__id"), F.lit(n_buckets))).orderBy(
        F.col("__id").asc()
    )
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    neg = F.coalesce(
        F.lead("anchor").over(w),
        F.when(
            F.count("*").over(wall) > 1, F.first("anchor").over(wall)
        ),
    )
    return paired.withColumn("negative", neg).withColumnRenamed(
        "__id", id_col
    )


def contrastive_pairs_sql(
    chunk_tokens: int = 32,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB mirror of :func:`contrastive_pairs` (1-based list slices;
    same id-arithmetic selection and bucket-lead negative)."""
    c = chunk_tokens
    return f"""
WITH tk AS (
  SELECT {id_col} AS id,
         list_filter(regexp_split_to_array({text_col}, '\\s+'),
                     x -> x <> '') AS tk
  FROM {table}),
el AS (
  SELECT id, tk, ((len(tk) + {c - 1}) // {c})::INT AS n
  FROM tk WHERE (len(tk) + {c - 1}) // {c} >= 2),
sel AS (
  SELECT id, n,
         (id % n)::INT AS a,
         ((id % n + 1 + id % (n - 1)) % n)::INT AS p,
         tk
  FROM el),
pairs AS (
  SELECT id,
         array_to_string(tk[a * {c} + 1 : a * {c} + {c}], ' ') AS anchor,
         array_to_string(tk[p * {c} + 1 : p * {c} + {c}], ' ') AS positive
  FROM sel)
SELECT id AS {id_col}, anchor, positive,
       coalesce(
         lead(anchor) OVER (PARTITION BY id % {n_buckets} ORDER BY id),
         CASE WHEN count(*) OVER (PARTITION BY id % {n_buckets}) > 1
              THEN first_value(anchor) OVER (
                     PARTITION BY id % {n_buckets} ORDER BY id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
         END) AS negative
FROM pairs
"""
