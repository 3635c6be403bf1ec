"""Hashed bag-of-words document vectors (the "hashing trick").

Bridges text-only corpora into the embedding-space operators —
distributed k-means (`operators/clustering.py`), SemDeDup
(`operators/dedup.py:semdedup`), ANN top-k (`operators/similarity.py`)
— without an external embedding model: each document becomes a dense
``dim``-dimensional vector where component ``i`` accumulates the term
frequencies of the tokens hashing to bucket ``i`` (optionally
IDF-weighted), L2-normalized so cosine comparisons are meaningful.

Exactness + scale:

- token -> bucket is a pure hash expression; ``portable=True`` uses
  the engine-portable rolling polynomial (same contract as
  `simhash_fingerprints`) so the WHOLE vectorization mirrors in ANSI
  SQL; ``portable=False`` uses JVM xxhash64 for production;
- one groupBy (id, bucket) with map-side combine carries compact
  (id, int, count) rows; the per-doc vector assembly is a second
  id-keyed aggregation whose fold is O(dim * present-buckets) —
  never a pivot, never a UDF;
- optional ``idf`` weighting joins the (broadcast) document-frequency
  table from `functions.text.vocabulary` before accumulation.

At 100 TB: two compact shuffles (both map-side-combined), vectors are
``dim`` doubles/doc — the same budget as any embedding column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkall_spark.functions.text import tokens

# portable rolling-hash constants (functions.text.fingerprint contract)
_P_MOD = 1_000_000_007


def _portable_token_hash(tok: Column) -> Column:
    """Rolling polynomial over the token's characters, mod 1e9+7 —
    textually mirrorable in SQL (list_reduce over ascii codes)."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % _P_MOD,
    )


def hashed_token_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    idf: DataFrame | None = None,
    normalize: bool = True,
    portable: bool = True,
) -> DataFrame:
    """``(id_col, vector)`` with ``vector: array<double>`` of length
    ``dim``.  Tokens are lowercased whitespace tokens; zero-token
    documents get the zero vector (callers using cosine downstream
    already handle zero norms — semdedup/assign_cells score them 0).

    ``idf``: optional ``(token, doc_freq)`` DataFrame (e.g. from
    `functions.text.vocabulary`); occurrences are then damped by
    ``1 / ln(e + doc_freq)`` so corpus-ubiquitous tokens stop
    dominating buckets (unseen tokens weigh 1).  Leave ``None`` for
    raw TF — after L2 normalization most clustering uses are
    insensitive to the global rescale.
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"),
    )
    h = (
        _portable_token_hash(F.col("__tok"))
        if portable
        else F.xxhash64("__tok")
    )
    bucketed = tok.withColumn("__b", F.pmod(h, F.lit(dim)).cast("int"))
    if idf is not None:
        w = F.broadcast(
            idf.select(
                F.col(idf.columns[0]).alias("__tok"),
                F.col(idf.columns[1]).cast("double").alias("__df"),
            )
        )
        bucketed = bucketed.join(w, "__tok", "left").withColumn(
            "__w", F.lit(1.0) / F.log(F.lit(2.718281828459045) + F.coalesce("__df", F.lit(0.0)))
        )
    else:
        bucketed = bucketed.withColumn("__w", F.lit(1.0))
    per_bucket = bucketed.groupBy("__id", "__b").agg(
        F.sum("__w").alias("__v")
    )
    pairs = per_bucket.groupBy("__id").agg(
        F.collect_list(F.struct("__b", "__v")).alias("__p")
    )
    vec = F.aggregate(
        F.col("__p"),
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, p: F.transform(
            acc,
            lambda x, i: F.when(i == p["__b"], x + p["__v"]).otherwise(x),
        ),
    )
    assembled = pairs.withColumn("__vec", vec)
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                F.col("__vec"), F.lit(0.0), lambda a, x: a + x * x
            )
        )
        assembled = assembled.withColumn(
            "__vec",
            F.when(
                norm > 0,
                F.transform(F.col("__vec"), lambda x: x / norm),
            ).otherwise(F.col("__vec")),
        )
    out = docs.select(F.col(id_col).alias("__id")).join(
        assembled.select("__id", "__vec"), "__id", "left"
    )
    return out.select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("__vec"), F.array_repeat(F.lit(0.0), dim)).alias(
            "vector"
        ),
    )


def portable_token_hash_sql(value_sql: str) -> str:
    """DuckDB rendering of :func:`_portable_token_hash` (the poly
    char fold, acc = (acc*31 + codepoint) % P) — THE canonical SQL
    form; every oracle that mirrors the portable hash must build from
    this helper so a change to the fold desynchronizes loudly at one
    definition site instead of drifting across hand-copied blocks."""
    return (
        "list_reduce(list_prepend(0::BIGINT,"
        " [ascii(c)::BIGINT FOR c IN"
        f" list_filter(string_split({value_sql}, ''), x -> x <> '')]),"
        f" (acc, c) -> (acc * 31 + c) % {_P_MOD})"
    )


def hashed_vector_sql(dim: int, table: str = "documents") -> str:
    """DuckDB mirror of :func:`hashed_token_vectors` (portable hash,
    raw TF, L2-normalized) — the oracle contract for tests."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM {table}),
hashed AS (
  SELECT doc_id,
         CAST({portable_token_hash_sql('tok')} % {dim} AS INT) AS b
  FROM tok),
per AS (SELECT doc_id, b::BIGINT AS b, count(*)::DOUBLE AS v
        FROM hashed GROUP BY 1, 2),
pairs AS (
  SELECT doc_id, map_from_entries(list(row(b, v))) AS m
  FROM per GROUP BY doc_id),
assembled AS (
  SELECT doc_id,
         [coalesce(m[i][1], 0.0)::DOUBLE FOR i IN range(0, {dim})] AS vec
  FROM pairs),
normed AS (
  SELECT doc_id,
         CASE WHEN sqrt(list_dot_product(vec, vec)) > 0
              THEN list_transform(vec,
                     x -> x / sqrt(list_dot_product(vec, vec)))
              ELSE vec END AS vector
  FROM assembled)
SELECT d.doc_id,
       coalesce(n.vector, [0.0 FOR i IN range(0, {dim})]) AS vector
FROM {table} d LEFT JOIN normed n USING (doc_id)
"""


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document DEFLATE compression ratio — the classic cheap
    gibberish/repetition signal web-corpus pipelines filter on (highly
    repetitive text compresses far below ~0.3; random/encrypted blobs
    sit near 1.0; natural prose lands ~0.3-0.7).  Complements the
    Gopher repetition rules (functions/text.py): those count explicit
    n-gram repeats, this catches ANY low-entropy structure.

    Output: ``df`` + ``compressed_len`` (bigint) + ``compression_ratio``
    (double, 6dp; empty/NULL text -> 1.0).  DEFLATE at a fixed
    ``level`` is fully deterministic (stdlib zlib), so values are
    stable across partitionings, sessions, and machines.

    Scale shape: one Arrow-batched ``mapInPandas`` pass — map-only, no
    shuffle, no driver data; zlib is C-speed so the per-byte cost is
    far below the tokenizing filters this usually rides alongside.
    """
    import pandas as pd

    from pyspark.sql import types as T

    fields = df.schema.fields + [
        T.StructField("compressed_len", T.LongType(), False),
        T.StructField("compression_ratio", T.DoubleType(), False),
    ]
    schema = T.StructType(fields)

    def _batches(it):
        import zlib

        for pdf in it:
            texts = pdf[text_col]
            clens, ratios = [], []
            for t in texts:
                if t is None or t == "":
                    clens.append(0)
                    ratios.append(1.0)
                    continue
                raw = t.encode("utf-8", errors="replace")
                c = len(zlib.compress(raw, level))
                clens.append(c)
                ratios.append(round(c / len(raw), 6))
            out = pdf.copy()
            out["compressed_len"] = pd.Series(clens, index=pdf.index, dtype="int64")
            out["compression_ratio"] = pd.Series(ratios, index=pdf.index)
            yield out

    return df.mapInPandas(_batches, schema=schema)
