"""Benchmark decontamination: flag/remove training documents that
overlap an evaluation set by shared word n-grams.

The standard pretrain hygiene step (popularized by GPT-2/GPT-3 and the
Pile/Gopher reports): a training document is *contaminated* when it
shares at least ``min_hits`` distinct ``n``-gram(s) with any benchmark
document, where an n-gram is ``n`` consecutive whitespace tokens.

100 TB design — zero full-corpus shuffles:

- the benchmark side (eval sets are tiny relative to the corpus) is
  reduced to its DISTINCT n-gram set and broadcast;
- the corpus side expands to n-grams with pure Column expressions
  (``split`` → ``sequence`` → ``transform``/``slice`` → explode), a
  map-side-only row expansion feeding a broadcast hash join — no
  exchange of corpus data;
- only MATCHED grams (rare by definition) reach the per-doc groupBy,
  so the single shuffle is proportional to contamination, not corpus
  size;
- the final annotate/clean join brings the small hit table back to the
  corpus as a broadcast (left / left_anti) join.

No UDFs anywhere — the whole plan stays inside whole-stage codegen.
Tokenization matches ``functions.text.tokens`` (non-empty whitespace
split), which the DuckDB test oracles mirror bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkall_spark.functions.text import tokens


def ngrams(col: Column | str, n: int, lowercase: bool = True) -> Column:
    """Distinct word n-grams of a text column as an array<string>.

    Documents with fewer than ``n`` tokens yield an empty array (never
    NULL, so downstream ``explode`` simply emits no rows)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    toks = tokens(c)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _gram_rows(
    df: DataFrame, id_col: str | None, text_col: str, n: int, lowercase: bool
) -> DataFrame:
    out = df.select(
        *([F.col(id_col).alias("__id")] if id_col else []),
        F.explode(ngrams(text_col, n, lowercase)).alias("__gram"),
    )
    return out


def ngram_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
    lowercase: bool = True,
    mode: str = "annotate",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag (``mode='annotate'``) or drop (``mode='clean'``) documents
    sharing >= ``min_hits`` distinct word ``n``-grams with ``bench``.

    annotate: ``docs`` + ``n_hits`` (int, distinct benchmark n-grams
    found in the doc) + ``contaminated`` (bool).
    clean: the subset of ``docs`` with ``n_hits < min_hits``, original
    columns only (implemented as a broadcast left-anti join against the
    contaminated-id set).
    """
    if mode not in ("annotate", "clean"):
        raise ValueError(f"mode must be 'annotate' or 'clean', got {mode!r}")
    bcol = bench_text_col or text_col
    bench_grams = _gram_rows(bench, None, bcol, n, lowercase).distinct()
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)

    # corpus grams are array_distinct per doc, so a plain count after the
    # inner join IS the distinct-hit count; only matched rows shuffle
    hits = (
        _gram_rows(docs, id_col, text_col, n, lowercase)
        .join(bench_grams, "__gram")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )

    if mode == "clean":
        dirty = hits.filter(F.col("n_hits") >= min_hits).select("__id")
        return docs.join(
            F.broadcast(dirty), docs[id_col] == dirty["__id"], "left_anti"
        )

    out = docs.join(
        F.broadcast(hits), docs[id_col] == hits["__id"], "left"
    ).drop("__id")
    return out.withColumn(
        "n_hits", F.coalesce(F.col("n_hits"), F.lit(0))
    ).withColumn("contaminated", F.col("n_hits") >= min_hits)
