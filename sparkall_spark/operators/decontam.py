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


def bloom_bitmap(
    rows: DataFrame, col: str, m_bits: int, k: int
) -> DataFrame:
    """A Bloom filter over ``rows[col]`` as ONE row holding an
    ``array<bigint>`` bitmap (``m_bits``/64 words, ``k`` hash functions
    = xxhash64 salted with the function index).

    Pure Column algebra — the same shape Spark's own runtime bloom
    filters use (an aggregate building a compact bitmap that then
    prunes the probe side), rebuilt from public primitives because
    ``bloom_filter_agg``/``might_contain`` are not registered for SQL.
    The bitmap is fixed-size regardless of input cardinality, so it
    broadcasts in O(m_bits/8) bytes where the raw value set may be
    gigabytes."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = rows.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("__pos")
    )
    words = pos.select(
        (F.col("__pos") / 64).cast("int").alias("__w"),
        # shiftleft's Column API takes only a literal shift count; the
        # SQL form accepts a column
        F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__bit"),
    ).groupBy("__w").agg(F.bit_or("__bit").alias("__bits"))
    # dense bitmap: a global aggregate always returns one row, and an
    # empty input yields an all-zero filter (matches nothing)
    return words.agg(
        F.map_from_arrays(
            F.collect_list("__w"), F.collect_list("__bits")
        ).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at("__m", i), F.lit(0).cast("bigint")),
        ).alias("__bf")
    )


def bloom_might_contain(
    col: str | Column, bitmap_col: str | Column, m_bits: int, k: int
) -> Column:
    """Boolean Column: all ``k`` bit positions of column ``col`` are set
    in the ``array<bigint>`` bitmap column.  No false negatives by
    construction; false-positive rate ~ (1 - e^(-k*n/m))^k.  The salt
    literals must stay INT to hash identically to
    :func:`bloom_bitmap`'s build side (xxhash64 is type-sensitive).

    Built from Column objects (``F.call_function`` for the
    shiftleft-by-column piece, which the Column API only exposes with a
    literal shift count), so names needing backticks — dots, spaces,
    reserved words — resolve like any other DataFrame column; either
    names or Columns are accepted."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    c = F.col(col) if isinstance(col, str) else col
    bm = F.col(bitmap_col) if isinstance(bitmap_col, str) else bitmap_col
    cond = None
    for i in range(k):
        p = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits))
        word = F.element_at(bm, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), F.pmod(p, F.lit(64)).cast("int")
        )
        hit = word.bitwiseAND(bit) != 0
        cond = hit if cond is None else cond & hit
    return cond


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
    prefilter: str = "none",
    bloom_bits: int = 1 << 20,
    bloom_hashes: int = 5,
) -> DataFrame:
    """Flag (``mode='annotate'``) or drop (``mode='clean'``) documents
    sharing >= ``min_hits`` distinct word ``n``-grams with ``bench``.

    annotate: ``docs`` + ``n_hits`` (int, distinct benchmark n-grams
    found in the doc) + ``contaminated`` (bool).
    clean: the subset of ``docs`` with ``n_hits < min_hits``, original
    columns only (implemented as a broadcast left-anti join against the
    contaminated-id set).

    ``prefilter='bloom'`` inserts a Bloom-bitmap pass before the exact
    gram join: the bench gram set reduces to a fixed-size bitmap
    (``bloom_bits`` bits, ``bloom_hashes`` hashes, see
    :func:`bloom_bitmap`) that broadcasts as ONE row, and corpus grams
    that miss it die map-side.  Results are IDENTICAL to the exact path
    — bloom false positives are removed by the exact join — so this is
    the configuration for bench sets too large to broadcast raw: at
    1% fp rate the exact join's probe side shrinks to ~(hits + 1% of
    corpus grams), and ``broadcast_bench=False`` lets the confirm join
    shuffle only that remnant."""
    if mode not in ("annotate", "clean"):
        raise ValueError(f"mode must be 'annotate' or 'clean', got {mode!r}")
    if prefilter not in ("none", "bloom"):
        raise ValueError(f"prefilter must be 'none' or 'bloom', got {prefilter!r}")
    bcol = bench_text_col or text_col
    bench_grams = _gram_rows(bench, None, bcol, n, lowercase).distinct()
    corpus_grams = _gram_rows(docs, id_col, text_col, n, lowercase)
    if prefilter == "bloom":
        bf = bloom_bitmap(bench_grams, "__gram", bloom_bits, bloom_hashes)
        corpus_grams = (
            corpus_grams.crossJoin(F.broadcast(bf))
            .filter(
                bloom_might_contain("__gram", "__bf", bloom_bits, bloom_hashes)
            )
            .drop("__bf")
        )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)

    # corpus grams are array_distinct per doc, so a plain count after the
    # inner join IS the distinct-hit count; only matched rows shuffle
    hits = (
        corpus_grams
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


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    lowercase: bool = True,
) -> DataFrame:
    """Cross-corpus overlap diagnostics as ONE row: how much of corpus
    ``a`` leaks into / from corpus ``b`` at the word-``n``-gram level —
    the measurement behind train/validation leakage checks and
    source-mixing decisions.

    Columns: ``n_grams_a``/``n_grams_b`` (distinct gram counts),
    ``n_shared`` (distinct grams present in both), ``gram_jaccard``
    (6dp), ``containment_a_in_b``/``containment_b_in_a`` (6dp —
    shared/n_grams_a and shared/n_grams_b: when corpus sizes are
    skewed, Jaccard undersells contamination because the big side's
    gram count dominates the union, while containment answers the
    question that matters — what fraction of THIS corpus's grams
    appear in the other), ``n_docs_a``/``n_docs_a_overlapping``
    (documents of ``a`` containing at least one shared gram).

    Scale: each side reduces to DISTINCT grams first (per-doc
    array_distinct happens map-side in the gram expansion); the only
    joins are gram-keyed.  At very large scale swap the gram STRINGS
    for 64-bit gram hashes before the joins (collision odds ~
    |grams|^2/2^64) — strings are kept here so the DuckDB oracle can
    mirror the values exactly."""
    ga = _gram_rows(a, id_col, text_col, n, lowercase)
    gb = _gram_rows(b, None, text_col, n, lowercase).distinct()
    ga_d = ga.select("__gram").distinct()
    shared = ga_d.join(gb, "__gram")  # distinct by construction
    counts = (
        ga_d.agg(F.count(F.lit(1)).alias("n_grams_a"))
        .crossJoin(gb.agg(F.count(F.lit(1)).alias("n_grams_b")))
        .crossJoin(shared.agg(F.count(F.lit(1)).alias("n_shared")))
        .crossJoin(
            a.agg(F.count(F.lit(1)).alias("n_docs_a"))
        )
        .crossJoin(
            ga.join(gb, "__gram")
            .agg(F.count_distinct("__id").alias("n_docs_a_overlapping"))
        )
    )
    union = (
        F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_shared")
    ).cast("double")
    def _ratio(num: str, den: str) -> Column:
        d = F.col(den).cast("double")
        return F.round(
            F.when(d > 0, F.col(num) / d).otherwise(F.lit(0.0)), 6
        )

    return (
        counts.withColumn(
            "gram_jaccard",
            F.round(
                F.when(union > 0, F.col("n_shared") / union).otherwise(
                    F.lit(0.0)
                ),
                6,
            ),
        )
        .withColumn("containment_a_in_b", _ratio("n_shared", "n_grams_a"))
        .withColumn("containment_b_in_a", _ratio("n_shared", "n_grams_b"))
    )


def minhash_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    mode: str = "annotate",
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag/drop training documents
    whose word-``ngram`` Jaccard similarity with ANY benchmark document
    is >= ``threshold`` (near-duplicate contamination that exact n-gram
    matching misses when the eval text was lightly edited).

    Candidates come from MinHash-LSH banding BETWEEN the two sides only
    (never corpus x corpus): the benchmark's band table is tiny and
    broadcast, so the corpus side is a map-only signature pass feeding a
    broadcast join — no full-corpus shuffle; only candidate pairs are
    verified with exact Jaccard over the shingle arrays, so every
    emitted ``max_jaccard`` is exact while recall is probabilistic — a
    true-Jaccard-j pair is missed with probability
    ``(1 - j^(num_hashes/bands))^bands`` (~4e-8 at j=0.9 with the
    defaults; raise ``bands`` for lower thresholds).

    annotate: ``docs`` + ``n_bench_matches`` + ``max_jaccard`` (6dp,
    0.0 when unmatched) + ``contaminated``.  clean: the unmatched
    subset, original columns (broadcast left-anti join).
    """
    if mode not in ("annotate", "clean"):
        raise ValueError(f"mode must be 'annotate' or 'clean', got {mode!r}")
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    from sparkall_spark.operators.dedup import (
        _sig_sql,
        _with_shingles,
        jaccard,
    )

    rows = num_hashes // bands
    bcol = bench_text_col or text_col

    def banded(d: DataFrame, idc: str, tc: str) -> DataFrame:
        sh = _with_shingles(d, idc, tc, ngram)
        sig = sh.withColumn(
            "__sig",
            F.expr(
                _sig_sql("transform(__sh, t -> xxhash64(t))", num_hashes, seed)
            ),
        )
        return sig.select(
            "__id",
            "__sh",
            F.posexplode(
                F.array(
                    *[
                        F.hash(F.slice("__sig", i * rows + 1, rows))
                        for i in range(bands)
                    ]
                )
            ).alias("__band", "__bh"),
        )

    # bench ids are internal only (outputs never depend on which row got
    # which id), so a synthetic id is fine
    b = bench.select(
        F.monotonically_increasing_id().alias("__bid"),
        F.col(bcol).alias("__btext"),
    )
    b_bands = banded(b, "__bid", "__btext").select(
        F.col("__id").alias("__bid"),
        F.col("__sh").alias("__bsh"),
        "__band",
        "__bh",
    )
    c_bands = banded(docs, id_col, text_col)

    # candidate = first matching band only (dedup via distinct ids)
    cand = (
        c_bands.join(F.broadcast(b_bands), ["__band", "__bh"])
        .select("__id", "__sh", "__bid", "__bsh")
        .dropDuplicates(["__id", "__bid"])
    )
    hits = (
        cand.withColumn("__j", F.round(jaccard(F.col("__sh"), F.col("__bsh")), 6))
        .filter(F.col("__j") >= threshold)
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_matches"),
            F.max("__j").alias("max_jaccard"),
        )
    )

    if mode == "clean":
        dirty = hits.select("__id")
        return docs.join(
            F.broadcast(dirty), docs[id_col] == dirty["__id"], "left_anti"
        )
    out = docs.join(
        F.broadcast(hits), docs[id_col] == hits["__id"], "left"
    ).drop("__id")
    return (
        out.withColumn(
            "n_bench_matches", F.coalesce(F.col("n_bench_matches"), F.lit(0))
        )
        .withColumn("max_jaccard", F.coalesce(F.col("max_jaccard"), F.lit(0.0)))
        .withColumn("contaminated", F.col("n_bench_matches") > 0)
    )


def embedding_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
    threshold: float = 0.95,
    mode: str = "annotate",
) -> DataFrame:
    """SEMANTIC benchmark decontamination: flag/drop training items
    whose embedding cosine with ANY benchmark item is >= ``threshold``
    — the third rung of the decontamination ladder (exact n-grams ->
    MinHash near-dup -> embedding similarity), catching paraphrased or
    translated eval leakage that token-level overlap misses entirely.

    annotate: ``docs`` + ``n_bench_matches`` (count of bench items at
    or above threshold) + ``max_cosine`` (6dp, 0.0 when unmatched) +
    ``contaminated``.  clean: the unmatched subset, original columns.

    100 TB shape: the benchmark side (eval sets are tiny relative to
    the corpus) is broadcast ONCE with precomputed norms; the corpus
    streams through a broadcast nested-loop join computing O(C x B)
    exact cosines with per-side norms cached (never recomputed per
    pair), and the per-item aggregation is map-side-combined on the
    corpus id, so only MATCHED partials reach the single shuffle.  The
    final annotate/clean join brings the small hit table back as a
    broadcast (left / left_anti) join — corpus data never shuffles.
    For bench sets too large to broadcast, pre-bucket both sides with
    ``similarity.ivf_topk``'s cells instead; exact-over-broadcast is
    the right plan for every published eval suite.
    """
    if mode not in ("annotate", "clean"):
        raise ValueError(f"mode must be 'annotate' or 'clean', got {mode!r}")
    from sparkall_spark.operators.similarity import dot, l2_norm

    bcol = bench_vec_col or vec_col
    corp = docs.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    b = bench.select(
        F.col(bcol).cast("array<double>").alias("__qv")
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    denom = F.col("__cn") * F.col("__qn")
    cos = F.round(
        F.when(
            denom > 0, dot(F.col("__cv"), F.col("__qv")) / denom
        ).otherwise(F.lit(0.0)),
        6,
    )
    hits = (
        corp.crossJoin(F.broadcast(b))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_matches"),
            F.max("__cos").alias("max_cosine"),
        )
    )
    if mode == "clean":
        dirty = hits.select("__id")
        return docs.join(
            F.broadcast(dirty), docs[id_col] == dirty["__id"], "left_anti"
        )
    out = docs.join(
        F.broadcast(hits), docs[id_col] == hits["__id"], "left"
    ).drop("__id")
    return (
        out.withColumn(
            "n_bench_matches", F.coalesce(F.col("n_bench_matches"), F.lit(0))
        )
        .withColumn("max_cosine", F.coalesce(F.col("max_cosine"), F.lit(0.0)))
        .withColumn("contaminated", F.col("n_bench_matches") > 0)
    )
