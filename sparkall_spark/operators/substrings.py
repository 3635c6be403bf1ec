"""Exact-substring span deduplication (ExactSubstr, token-window form).

Long verbatim passages repeat across web documents — licenses, quoted
articles, templated product text — and survive *document-level* dedup
because the surrounding page differs.  Lee et al., "Deduplicating
Training Data Makes Language Models Better" (2021), remove every
duplicated substring of >= 50 tokens, keeping one occurrence; their
single-node implementation builds a suffix array over the whole corpus.

This module re-expresses that operator relationally (the shape used by
the public BigQuery/MapReduce ports of the same idea): a duplicated
substring of length >= k is exactly a run of duplicated k-token
windows, so

1. every document expands to its k-token windows (map-side: ``split``
   -> ``sequence`` -> ``slice`` -> ``explode`` — pure Column exprs);
2. window identity is the xxhash64 of the window's space-joined tokens
   (tokens are whitespace-split, so the space join is injective; 64-bit
   collisions at 1e12 windows: ~0.03 expected false merges — see note);
3. ONE hash-partitioned ranking (``row_number`` over (doc, pos) per
   window hash) decides the globally-first occurrence of every
   duplicated window — this compact (hash, doc, pos) shuffle is the
   operator's entire corpus-scale cost, the distributed stand-in for
   the suffix array;
4. only NON-survivor window starts (proportional to duplication, not
   corpus size) shuffle again into per-doc sorted start lists;
5. each document is rebuilt map-side with a single O(n) fold
   (``F.aggregate``): overlapping cut ranges [s, s+k) merge as the
   fold walks the sorted starts, and the kept token ranges are sliced
   and flattened — no per-token rows, no UDFs.

Semantics (deterministic, engine-independent):

- a window is *duplicated* when its k-token content occurs at more
  than one (doc, pos); the occurrence with the smallest (doc_id, pos)
  survives, every other occurrence's token range [pos, pos+k) is cut;
- a repeated passage of length L >= k is covered completely by its
  L-k+1 duplicated windows, so the whole passage disappears from every
  non-first copy (and from every non-first self-repetition within one
  document — periodic text collapses to its first period, as in the
  reference implementation);
- rebuilt text is the kept tokens joined by single spaces: the
  operator is defined at token level, so original inter-token
  whitespace is normalized (documents shorter than k tokens are
  untouched apart from the same normalization — callers wanting
  byte-identical text for untouched docs can gate on
  ``n_removed_tokens = 0``);
- cut seams create new token adjacencies (the tail of a kept prefix
  now abuts the head of a kept suffix) — inherent to span removal and
  identical to the reference behavior.

100 TB notes: step 3 shuffles one 24-byte triple per corpus token —
within 2x of the bytes a MinHash signature pass shuffles, and the
honest lower bound for *exact* corpus-by-corpus matching (the suffix
array it replaces is also super-linear in practice).  The hash key is
uniform by construction, so AQE never sees skew except for pathological
single-gram floods (a window repeated millions of times), which land in
one rank partition; row_number there is linear and spills, not breaks.
Everything after step 3 scales with the amount of duplication found.
Map-side window hashing re-reads each token k times (O(n*k) bytes
hashed); a polynomial prefix-hash fold would make it O(n), but the
map-side CPU is dwarfed by the rank shuffle long before k=50 matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from sparkall_spark.functions.text import tokens


def _window_starts(toks: Column, k: int) -> Column:
    """0-based window start positions [0 .. size-k]; empty when size<k."""
    return F.when(
        F.size(toks) >= k, F.sequence(F.lit(0), F.size(toks) - k)
    ).otherwise(F.array().cast("array<int>"))


def _cut_and_rebuild(toks: Column, starts: Column, k: int) -> Column:
    """Kept-token array after cutting [s, s+k) for every start in the
    SORTED ``starts`` array — one O(n + |starts|) fold, no UDF.

    The fold carries (cursor, kept-ranges): a start below the cursor
    only extends the current cut (overlap merge); a start above it
    closes the kept gap [cursor, s).  ``finish`` appends the tail range
    and slices+flattens the kept tokens.
    """
    n = F.size(toks)
    init = F.struct(
        F.lit(0).alias("cur"),
        F.array().cast("array<struct<s:int,e:int>>").alias("gaps"),
    )

    def step(acc: Column, s: Column) -> Column:
        gap = F.struct(acc["cur"].alias("s"), s.alias("e"))
        return F.struct(
            F.greatest(acc["cur"], s + F.lit(k)).alias("cur"),
            F.when(s > acc["cur"], F.concat(acc["gaps"], F.array(gap)))
            .otherwise(acc["gaps"])
            .alias("gaps"),
        )

    def finish(acc: Column) -> Column:
        tail = F.struct(acc["cur"].alias("s"), n.alias("e"))
        ranges = F.when(
            acc["cur"] < n, F.concat(acc["gaps"], F.array(tail))
        ).otherwise(acc["gaps"])
        return F.flatten(
            F.transform(
                ranges, lambda r: F.slice(toks, r["s"] + 1, r["e"] - r["s"])
            )
        )

    return F.aggregate(starts, init, step, finish)


def exact_substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    mode: str = "annotate",
    out_col: str = "clean_text",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Remove every duplicated k-token substring, keeping the globally
    first occurrence (min (doc_id, pos)).

    annotate: ``docs`` + ``out_col`` (rebuilt text) + ``n_removed_tokens``.
    rewrite:  ``docs`` with ``text_col`` replaced by the rebuilt text.

    ``k`` is the minimum duplicated-substring length in tokens (Lee et
    al. use 50; small k over-cuts natural language).  Windows match on
    exact token content — no lowercasing or normalization.

    ``min_parallelism``: the O(n*k) window-hash expansion runs on the
    SCAN partitioning — a corpus that arrives as few splits (one small
    parquet file; a coalesced upstream stage) serializes it.  Set this
    to repartition the doc side first (one extra shuffle of raw text).
    Leave ``None`` at scale: a 100 TB corpus already has thousands of
    splits, and the rank exchange re-balances everything after.
    """
    if mode not in ("annotate", "rewrite"):
        raise ValueError(f"mode must be 'annotate' or 'rewrite', got {mode!r}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    toks = tokens(F.col(text_col))

    win_src = (
        docs.repartition(min_parallelism) if min_parallelism else docs
    )
    wins = win_src.select(
        F.col(id_col).alias("__sid"),
        F.explode(_window_starts(toks, k)).alias("__pos"),
        toks.alias("__tk"),
    ).select(
        "__sid",
        "__pos",
        F.xxhash64(
            F.concat_ws(" ", F.slice("__tk", F.col("__pos") + 1, k))
        ).alias("__wh"),
    )

    # the one corpus-scale shuffle: rank every occurrence of a window
    # hash by (doc, pos); rank 1 survives, the rest are cut starts
    rn = F.row_number().over(
        Window.partitionBy("__wh").orderBy("__sid", "__pos")
    )
    cut_starts = (
        wins.withColumn("__rn", rn)
        .filter(F.col("__rn") > 1)
        .groupBy("__sid")
        .agg(F.sort_array(F.collect_list("__pos")).alias("__starts"))
    )

    joined = docs.join(
        cut_starts, docs[id_col] == cut_starts["__sid"], "left"
    ).drop("__sid")
    starts = F.coalesce(
        F.col("__starts"), F.array().cast("array<int>")
    )
    kept = _cut_and_rebuild(tokens(F.col(text_col)), starts, k)

    target = text_col if mode == "rewrite" else out_col
    out = joined.withColumn("__kept", kept)
    out = out.withColumn(target, F.concat_ws(" ", F.col("__kept")))
    if mode == "annotate":
        out = out.withColumn(
            "n_removed_tokens",
            F.size(tokens(F.col(text_col))) - F.size(F.col("__kept")),
        )
    return out.drop("__starts", "__kept")


def duplicated_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Per-document duplication profile without rewriting text:
    (id, n_tokens, n_dup_windows, dup_token_frac) — the corpus-health
    metric run before deciding to cut (dup_token_frac is the fraction
    of tokens covered by at least one non-surviving window)."""
    ann = exact_substring_dedup(
        docs.select(id_col, text_col), id_col, text_col, k, mode="annotate"
    )
    n_tok = F.size(tokens(F.col(text_col)))
    return ann.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.col("n_removed_tokens"),
        F.round(
            F.when(
                n_tok > 0, F.col("n_removed_tokens") / n_tok
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_token_frac"),
    )
