"""Document chunking: sliding token windows over a text column.

The standard pretraining preprocessing step between cleaning/dedup and
tokenizer sharding: split each document into overlapping windows of at
most ``chunk_tokens`` whitespace tokens, advancing by ``stride``
(overlap = chunk_tokens - stride).

100 TB design: pure JVM Column expressions end to end — ``split`` →
``sequence`` of window starts → ``posexplode`` → ``slice`` +
``array_join``.  No UDF, no shuffle (narrow transformation: each
document's chunks are produced where the document lives), no driver
participation; output size is bounded by ceil(n_tokens / stride)
chunks per document.  Composes with the dedup/text operators as a
plain DataFrame→DataFrame stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Explode each document into sliding token windows.

    Returns (id_col, chunk_id, chunk_text, n_tokens):
    ``chunk_id`` is the 0-based window index, ``chunk_text`` the
    space-joined window, ``n_tokens`` its true token count (==
    chunk_tokens except possibly the last window).  Empty/whitespace
    documents yield one empty chunk (chunk_id 0, n_tokens 0) so no
    document silently disappears.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    stride = chunk_tokens if stride is None else stride
    if not 0 < stride <= chunk_tokens:
        raise ValueError("stride must be in (0, chunk_tokens]")

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # trim('') splits to ['']: normalize to a true empty array
    toks = F.when(
        (F.col(text_col).isNull()) | (F.trim(F.col(text_col)) == ""),
        F.array().cast("array<string>"),
    ).otherwise(toks)
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... < n  (>= one window always)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )

    out = (
        df.withColumn("__toks", toks)
        .withColumn("__n", n)
        .select(
            F.col(id_col),
            "__toks",
            "__n",
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        # slice() is 1-based; windows starting past the end are dropped
        # (sequence's cap already guarantees __start < max(n, 1))
        .withColumn(
            "__win", F.slice("__toks", F.col("__start") + 1, chunk_tokens)
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.array_join("__win", " ").alias("chunk_text"),
            F.size("__win").cast("bigint").alias("n_tokens"),
        )
    )
    return out
