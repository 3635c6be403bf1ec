"""Data selection for pretraining corpora: domain token caps,
CCNet-style perplexity bucketing, and DSIR importance resampling
(extension; no reference analog — the reference stops at SPARQL-shaped
relational queries, `/root/reference/src/main/scala/org/squerall/`).

Three published selection stages a 100 TB pipeline runs between dedup
and packing:

- :func:`stratum_token_cap` — greedy per-stratum (host / domain /
  source) token budget, the "no single host dominates the corpus"
  crawl-curation rule.  ONE shuffle on the stratum key.
- :func:`perplexity_buckets` — CCNet (Wenzek et al. 2020) head /
  middle / tail terciles over LM scores, the standard way to grade web
  text by reference-corpus likelihood without a hard cutoff.
- :func:`dsir_select` — Data Selection via Importance Resampling (Xie
  et al. 2023): rank candidates by how much more likely a *target*
  domain LM finds them than a *raw* corpus LM, and take a
  Gumbel-top-k sample ∝ that importance weight.

Exactness design (same discipline as ``operators/lm.py``): every
selection predicate runs in exact integer arithmetic.  Importance
weights are differences of BIGINT micro-logp sums; Gumbel noise is
derived from the engine-portable LCG hash (``operators/sampling._mix``)
and quantized to micro units the moment it is born, so the ranking key
is a BIGINT and the selected set is bit-identical across partitionings,
reruns, and engines (DuckDB mirrors in tests and the driver gate).
The only floats that ever appear are single correctly-rounded IEEE
divisions (exact cross-engine) or derived convenience columns.

Scale design: caps and buckets shuffle a NARROW (id, score) projection
once; DSIR's top-k is ``orderBy().limit()`` — Catalyst plans
TakeOrderedAndProject (per-partition partial top-k, no global sort
barrier).  Nothing here collects row-scale data to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from sparkall_spark.operators._cache import persist_tracked
from sparkall_spark.operators.sampling import _M, _mix, mix_sql

MICRO = 1_000_000

#: denominator turning the LCG hash into u ∈ (0,1): (mix+1)/2^31 —
#: a power of two, so the division is exact in IEEE double.
_U_DENOM = float(_M + 1)  # 2**31

_INT_TYPES = ("tinyint", "smallint", "int", "bigint")


def _require_numeric_id(df: DataFrame, id_col: str, what: str) -> None:
    """The LCG hash is integer arithmetic over a BIGINT id; a string id
    (e.g. crawl_to_documents' hex doc_id) would either fail the cast
    under ANSI mode or silently null the hash out — fail loudly with
    the fix instead."""
    dtype = dict(df.dtypes).get(id_col)
    if dtype not in _INT_TYPES:
        raise ValueError(
            f"{what} requires an integer id column for the portable "
            f"hash; {id_col!r} is {dtype!r} — derive one first, e.g. "
            f'df.withColumn("num_id", F.xxhash64("{id_col}"))'
        )


def stratum_token_cap(
    df: DataFrame,
    stratum_col: str,
    n_tokens_col: str,
    token_budget: int,
    id_col: str,
    order_col: str | None = None,
    descending: bool = True,
    seed: int = 0,
) -> DataFrame:
    """Keep, per stratum, the greedy prefix of documents whose running
    token total stays within ``token_budget``.

    Documents are taken in deterministic order — ``order_col``
    descending by default (e.g. quality score; best docs claim the
    budget first), falling back to hash order when no ``order_col`` is
    given; ``id_col`` always breaks ties, so the prefix is unique.  A
    document is kept iff its OWN running sum (inclusive) fits the
    budget; a later, smaller document is NOT pulled forward into the
    gap (greedy prefix, not bin packing — membership stays a pure
    function of the ordered prefix, which is what makes reruns and the
    SQL mirror exact).  Oversized single documents (> budget) are
    dropped even when the stratum is otherwise empty.

    One shuffle, keyed by the stratum; per-stratum state is a running
    BIGINT sum over the narrow (id, tokens, order) projection.  A
    pathological hot stratum lands on one task — cap its input first
    with :func:`sparkall_spark.operators.sampling.stratified_sample`
    if a single stratum outgrows a task.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if order_col is not None:
        # NULLS LAST both directions: Spark's bare asc() is NULLS
        # FIRST, DuckDB's is NULLS LAST — a nullable order column would
        # silently hand NULL rows the budget first and break the
        # cross-engine contract
        first = (
            F.col(order_col).desc_nulls_last()
            if descending
            else F.col(order_col).asc_nulls_last()
        )
        order = [first, F.col(id_col).asc()]
    else:
        _require_numeric_id(df, id_col, "stratum_token_cap(order_col=None)")
        order = [_mix(F.col(id_col), seed).asc(), F.col(id_col).asc()]
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(n_tokens_col).cast("bigint")).over(w)
    return (
        df.withColumn("__run", running)
        .filter(F.col("__run") <= F.lit(int(token_budget)))
        .drop("__run")
    )


def stratum_token_cap_sql(
    table: str,
    stratum_col: str,
    n_tokens_col: str,
    token_budget: int,
    id_col: str,
    order_col: str,
    descending: bool = True,
) -> str:
    """DuckDB/ANSI mirror of :func:`stratum_token_cap` (explicit
    ``order_col`` form) — the oracle/portability contract."""
    direction = "DESC" if descending else "ASC"
    return f"""
SELECT * EXCLUDE (__run) FROM (
  SELECT *, sum(CAST({n_tokens_col} AS BIGINT)) OVER (
      PARTITION BY {stratum_col}
      ORDER BY {order_col} {direction} NULLS LAST, {id_col}
      ROWS UNBOUNDED PRECEDING) AS __run
  FROM {table})
WHERE __run <= {int(token_budget)}
"""


def perplexity_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    sum_col: str = "sum_logp_micro",
    n_col: str = "n_lm_tokens",
    thresholds: tuple[float, float] | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """CCNet head/middle/tail bucketing over LM scores from
    :func:`sparkall_spark.operators.lm.lm_score`.

    The grading key is ``avg_micro = sum_logp_micro / n_lm_tokens`` —
    ONE integer-by-integer IEEE division, which is correctly rounded
    and therefore bit-identical on every engine (unlike a chain of
    float ops).  Higher = more reference-like = better.

    Default (``thresholds=None``): exact global terciles by rank —
    ``bucket = floor(3 * (rank-1) / n)`` over (avg_micro DESC, id)
    with non-empty docs only; zero-token documents go straight to
    ``tail`` (no evidence ⇒ worst grade, CCNet's convention).  The
    ranking sorts only the narrow (id, sum, n) projection and joins the
    label back by ``id_col`` (which must therefore be unique); at true
    corpus scale pass explicit ``thresholds=(head_min, middle_min)``
    avg-micro cutoffs instead (computed once from a sample or a
    previous epoch) — bucketing then becomes a map-only expression
    with no global sort at all.
    """
    avg = F.col(sum_col).cast("double") / F.col(n_col).cast("double")
    if thresholds is not None:
        head_min, middle_min = thresholds
        if not head_min >= middle_min:
            raise ValueError("thresholds must be (head_min >= middle_min)")
        bucket = (
            F.when(F.col(n_col) <= 0, F.lit("tail"))
            .when(avg >= F.lit(float(head_min)), F.lit("head"))
            .when(avg >= F.lit(float(middle_min)), F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        return scored.withColumn(out_col, bucket)
    w = Window.orderBy(avg.desc(), F.col(id_col).asc())
    nonempty = scored.filter(F.col(n_col) > 0)
    n_total = F.count("*").over(
        Window.partitionBy()
    )  # window COUNT avoids a second aggregate job
    # The unpartitioned rank window funnels its input through ONE task —
    # so rank ONLY the narrow (id, sum, n) projection (a few dozen bytes
    # per row regardless of how wide the caller's DataFrame is) and hash-
    # join the bucket label back by id.  The join shuffles the wide rows
    # across all partitions instead of collapsing them into the sort task.
    ranked = (
        nonempty.select(id_col, sum_col, n_col)
        .withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", n_total)
    )
    tercile = F.floor(
        (F.lit(3) * (F.col("__rk") - 1)) / F.col("__n")
    ).cast("int")
    named = (
        F.when(tercile == 0, F.lit("head"))
        .when(tercile == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    labels = ranked.select(F.col(id_col), named.alias(out_col))
    bucketed = nonempty.join(labels, on=id_col, how="inner")
    empties = scored.filter(F.col(n_col) <= 0).withColumn(
        out_col, F.lit("tail")
    )
    return bucketed.unionByName(empties)


def perplexity_buckets_sql(
    scored_cte: str,
    id_col: str = "doc_id",
    sum_col: str = "sum_logp_micro",
    n_col: str = "n_lm_tokens",
) -> str:
    """DuckDB mirror of the rank-tercile form of
    :func:`perplexity_buckets` over a CTE/table named ``scored_cte``."""
    avg = f"(CAST({sum_col} AS DOUBLE) / CAST({n_col} AS DOUBLE))"
    return f"""
SELECT {id_col}, {n_col}, {sum_col},
       CASE CAST(floor(3.0 * (rk - 1) / n) AS INT)
         WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
FROM (
  SELECT {id_col}, {n_col}, {sum_col},
         row_number() OVER (ORDER BY {avg} DESC, {id_col}) AS rk,
         count(*) OVER () AS n
  FROM {scored_cte} WHERE {n_col} > 0)
UNION ALL
SELECT {id_col}, {n_col}, {sum_col}, 'tail' AS bucket
FROM {scored_cte} WHERE {n_col} <= 0
"""


def bucket_thresholds(
    scored: DataFrame,
    sum_col: str = "sum_logp_micro",
    n_col: str = "n_lm_tokens",
) -> tuple[float, float]:
    """Calibrate ``(head_min, middle_min)`` avg-micro cutoffs for the
    map-only form of :func:`perplexity_buckets` from a scored sample:
    the exact 2/3- and 1/3-quantiles of ``sum/n`` over non-empty docs
    (higher avg = better, so the top third starts at the 2/3 mark).

    Run this ONCE on a bounded sample (or yesterday's epoch), then
    bucket the full corpus with ``thresholds=`` — no global sort ever
    touches the corpus.  One aggregate job; two numbers to the driver.
    """
    avg = F.col(sum_col).cast("double") / F.col(n_col).cast("double")
    row = (
        scored.filter(F.col(n_col) > 0)
        .agg(F.percentile(avg, F.lit([2.0 / 3.0, 1.0 / 3.0])).alias("q"))
        .first()
    )
    if row is None or row["q"] is None:
        raise ValueError("cannot calibrate thresholds from an empty sample")
    head_min, middle_min = row["q"]
    return float(head_min), float(middle_min)


def gumbel_micro(id_col: Column | str, seed: int = 0) -> Column:
    """Quantized Gumbel(0,1) noise from the engine-portable id hash:
    ``round(-ln(-ln((mix(id)+1) / 2^31)) * 1e6)`` as BIGINT.

    ``u = (mix+1)/2^31`` is an exact dyadic rational in (0,1), so both
    ``ln`` calls see bit-identical inputs everywhere; quantizing to
    micro the moment the noise is born keeps every downstream
    comparison in BIGINT (the same trick as lm.py's micro-logp — a
    last-ulp ``ln`` discrepancy would have to land within 5e-13 of a
    rounding boundary to change the integer, and the LM mirrors have
    pinned this stack green since r4).
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    u = (_mix(c, seed) + F.lit(1)).cast("double") / F.lit(_U_DENOM)
    return F.round(-F.log(-F.log(u)) * MICRO).cast("bigint")


def gumbel_micro_sql(col_sql: str, seed: int = 0) -> str:
    """ANSI/DuckDB rendering of :func:`gumbel_micro` — must stay
    textually in lockstep."""
    u = f"(CAST(({mix_sql(col_sql, seed)}) + 1 AS DOUBLE) / {int(_U_DENOM)})"
    return f"CAST(round(-ln(-ln({u})) * {MICRO}) AS BIGINT)"


def dsir_weights(
    docs: DataFrame,
    target_model: DataFrame,
    target_unk_micro: int,
    raw_model: DataFrame,
    raw_unk_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
    keep_empty: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight:
    ``logw_micro = logp_target_micro - logp_raw_micro`` (exact BIGINT;
    both terms are the micro-logp document sums of
    :func:`sparkall_spark.operators.lm.lm_score` under the target-domain
    and raw-corpus unigram models).

    Positive ⇒ the target LM finds the document more likely than the
    raw LM ⇒ target-domain-like.  Only relative weights matter for
    resampling, so the (intractable) normalizer cancels — the paper's
    eq. (2) in log space.

    One token explode; the two models are combined into ONE vocab-scale
    (token, lp_target, lp_raw) table via full outer join, so scoring
    costs a single broadcast join + one doc-keyed shuffle — scoring
    twice would double the explode.  Output: (id, n_lm_tokens,
    logw_micro) with zero-token docs at n=0 / logw NULL (no evidence —
    filter or default them explicitly downstream).  ``keep_empty=False``
    drops zero-token docs by OMISSION instead, skipping the
    corpus-scale id join their retention costs (the select path never
    wants those rows anyway).
    """
    from sparkall_spark.functions.text import tokens

    combined = target_model.select(
        "token", F.col("logp_micro").alias("__lp_t")
    ).join(
        raw_model.select("token", F.col("logp_micro").alias("__lp_r")),
        "token",
        "full_outer",
    )
    if broadcast:
        combined = F.broadcast(combined)
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    per = (
        tok.join(combined, "token", "left")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_lm_tokens"),
            F.sum(
                F.coalesce(F.col("__lp_t"), F.lit(int(target_unk_micro)))
                - F.coalesce(F.col("__lp_r"), F.lit(int(raw_unk_micro)))
            ).alias("logw_micro"),
        )
    )
    if not keep_empty:
        return per.select(
            F.col("__id").alias(id_col), "n_lm_tokens", "logw_micro"
        )
    base = docs.select(F.col(id_col).alias("__id"))
    return base.join(per, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_lm_tokens"), F.lit(0)).alias("n_lm_tokens"),
        F.col("logw_micro"),
    )


def dsir_select(
    docs: DataFrame,
    target_model: DataFrame,
    target_unk_micro: int,
    raw_model: DataFrame,
    raw_unk_micro: int,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    broadcast: bool = True,
) -> DataFrame:
    """DSIR selection: Gumbel-top-k sample of ``k`` documents with
    probability ∝ their importance weight (without replacement).

    ``key_micro = logw_micro + gumbel_micro(id)`` — the Gumbel-max
    trick makes ``argmax(log w + G_i)`` an exact weighted draw, and the
    top-k of independent keys an exact weighted sample without
    replacement (Vieira 2014); the shared normalizer shifts every key
    equally so it cancels in the ranking.  Zero-token documents carry
    no evidence and are excluded before ranking.

    The ranking is ``orderBy(key DESC, id).limit(k)`` → Catalyst
    TakeOrderedAndProject: each task keeps a k-row heap, the driver
    merges heaps — no global sort, no skew sensitivity.  Output:
    (id, n_lm_tokens, logw_micro, key_micro), deterministic for a
    given seed.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    keyed = _dsir_keyed(
        docs, target_model, target_unk_micro, raw_model, raw_unk_micro,
        "dsir_select", id_col, text_col, seed, broadcast,
    )
    return keyed.orderBy(
        F.col("key_micro").desc(), F.col(id_col).asc()
    ).limit(int(k))


def _dsir_keyed(
    docs, target_model, target_unk_micro, raw_model, raw_unk_micro,
    what, id_col, text_col, seed, broadcast,
) -> DataFrame:
    """Shared weights+key construction for both select forms — one
    place for the weighting/keying semantics to live.  keep_empty=False
    already omits zero-token docs (no evidence) AND skips the
    corpus-scale retention join."""
    _require_numeric_id(docs, id_col, what)
    weighted = dsir_weights(
        docs,
        target_model,
        target_unk_micro,
        raw_model,
        raw_unk_micro,
        id_col=id_col,
        text_col=text_col,
        broadcast=broadcast,
        keep_empty=False,
    )
    return weighted.withColumn(
        "key_micro", F.col("logw_micro") + gumbel_micro(id_col, seed)
    )


def dsir_select_threshold(
    docs: DataFrame,
    target_model: DataFrame,
    target_unk_micro: int,
    raw_model: DataFrame,
    raw_unk_micro: int,
    key_min_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    broadcast: bool = True,
) -> DataFrame:
    """Map-only DSIR membership for very large selections: keep every
    document whose Gumbel key reaches ``key_min_micro`` instead of
    ranking for an exact top-k.

    Same keys as :func:`dsir_select` (same seed → same keys), but the
    decision is a per-row BIGINT comparison — no TakeOrdered heap
    collecting k rows at the driver, so the selected set can be
    billions of rows.  Calibrate the cutoff once (e.g. the k-th key of
    a :func:`dsir_select` over a sample, or a quantile of key_micro)
    and reuse it across the corpus.  Boundary semantics: EVERY row
    whose key equals the cutoff is kept — with the cutoff set to the
    k-th key this is the top-k set when keys are distinct there, and a
    slight superset if keys tie at the boundary (ties are realistic at
    billion-row scale; :func:`dsir_select` breaks them by id and
    truncates — use it when exactly-k matters).
    """
    keyed = _dsir_keyed(
        docs, target_model, target_unk_micro, raw_model, raw_unk_micro,
        "dsir_select_threshold", id_col, text_col, seed, broadcast,
    )
    return keyed.filter(F.col("key_micro") >= F.lit(int(key_min_micro)))


# ---------------------------------------------------------------------------
# Hashed n-gram DSIR features (Xie et al. 2023, §3.1) — the paper's
# actual feature space.  The unigram forms above remain as the simpler
# variant; these route the SAME weighting/keying machinery through
# hashed unigram+bigram OCCURRENCES in a fixed bucket domain.


def hashed_ngram_ids(
    col: Column | str, n_buckets: int = 10_000, max_n: int = 2
) -> Column:
    """Array of hashed feature-bucket ids — one element per n-gram
    OCCURRENCE for n = 1..``max_n`` (unigrams + bigrams by default,
    the DSIR paper's feature map): each gram's engine-portable rolling
    hash mod ``n_buckets``.

    Occurrences, not distinct grams: the model is a bag-of-features
    multinomial, so repeated grams must count repeatedly (unlike the
    dedup shingle sets).  Pure Column expression — the token array is
    let-bound so the split runs once per document, not once per gram.
    """
    from sparkall_spark.functions.text import let_bound, tokens
    from sparkall_spark.operators.features import _portable_token_hash

    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    raw = tokens(F.lower(F.col(col) if isinstance(col, str) else col))

    def bucket(gram: Column) -> Column:
        return F.pmod(_portable_token_hash(gram), F.lit(int(n_buckets))).cast(
            "int"
        )

    def body(toks: Column) -> Column:
        def gram_at(n: int):
            # closure factory, NOT a default-arg lambda: F.transform
            # inspects the callable's arity, and a second parameter
            # (even a defaulted one) makes it pass the ELEMENT INDEX
            # as that argument — `lambda i, _n=n:` silently binds _n
            # to the index, shifting every n-gram (caught by the
            # cross-engine mirror test).
            return lambda i: bucket(F.concat_ws(" ", F.slice(toks, i + 1, n)))

        legs = [F.transform(toks, bucket)]
        for n in range(2, max_n + 1):
            idx = F.when(
                F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
            ).otherwise(F.array().cast("array<int>"))
            legs.append(F.transform(idx, gram_at(n)))
        return F.concat(*legs) if len(legs) > 1 else legs[0]

    return let_bound(raw, body)


def hashed_ngram_list_sql(
    t_ref: str = "t", n_buckets: int = 10_000, max_n: int = 2
) -> str:
    """DuckDB list-of-int expression mirroring :func:`hashed_ngram_ids`
    over an ALREADY-TOKENIZED list column/expression ``t_ref`` — the
    composable form for oracles that tokenize in their own CTE."""
    from sparkall_spark.operators.features import _P_MOD

    def h(gram: str) -> str:
        return (
            "CAST(list_reduce(list_prepend(0::BIGINT, "
            f"[ascii(c)::BIGINT FOR c IN list_filter(string_split({gram},"
            " ''), x -> x <> '')]),"
            f" (acc, c) -> (acc * 31 + c) % {_P_MOD}) % {n_buckets} AS INT)"
        )

    legs = [f"list_transform({t_ref}, g -> {h('g')})"]
    for n in range(2, max_n + 1):
        gram = " || ' ' || ".join(f"{t_ref}[i+{j}]" for j in range(n))
        legs.append(
            f"CASE WHEN len({t_ref}) >= {n} THEN "
            f"[{h('(' + gram + ')')} FOR i IN generate_series(1, "
            f"len({t_ref}) - {n - 1})] ELSE [] END"
        )
    return " || ".join(legs)


def hashed_ngram_ids_sql(
    src: str, n_buckets: int = 10_000, max_n: int = 2
) -> str:
    """DuckDB mirror of :func:`hashed_ngram_ids` over the text
    expression ``src`` — the oracle contract for tests and the driver
    gate.  Returns a list-of-int expression."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({src}), '\\s+'),"
        " x -> x <> '')"
    )
    combined = hashed_ngram_list_sql("t", n_buckets, max_n)
    return f"(SELECT {combined} FROM (SELECT {toks} AS t))"


def train_hashed_ngram_model(
    ref: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    max_n: int = 2,
) -> tuple[DataFrame, int]:
    """Add-one-smoothed multinomial over the FIXED hashed-feature
    domain.  Returns ``(model, unk_logp_micro)``: the model has one
    row per OBSERVED bucket with BIGINT ``logp_micro`` (same micro
    quantization contract as ``lm.train_unigram_lm``); buckets never
    seen in ``ref`` score ``unk = round(ln(1/(total+n_buckets))*1e6)``.

    Because the feature domain is closed (exactly ``n_buckets``
    outcomes), the smoothing denominator is ``total + n_buckets`` —
    no vocabulary-size estimate, and the model is AT MOST
    ``n_buckets`` rows, so it always broadcasts (a fixed-size
    dictionary at any corpus scale, unlike a vocabulary model).

    ``counts`` is persisted (released via
    ``operators._cache.release_caches``) so the eager totals pass and
    the model's broadcast build share one featurize pass over ``ref``
    — same single-corpus-pass contract as ``lm.train_unigram_lm``."""
    counts = persist_tracked(
        ref.select(
            F.explode(
                hashed_ngram_ids(text_col, n_buckets, max_n)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("count"))
    )
    total = counts.agg(F.sum("count").cast("long")).first()[0] or 0
    denom = float(total + n_buckets)
    logp = F.log((F.col("count") + F.lit(1)).cast("double") / F.lit(denom))
    model = counts.select(
        "bucket",
        F.round(logp * MICRO).cast("long").alias("logp_micro"),
        logp.alias("logp"),
    )
    import math

    unk = int(round(math.log(1.0 / denom) * MICRO))
    return model, unk


def dsir_weights_hashed(
    docs: DataFrame,
    target_model: DataFrame,
    target_unk_micro: int,
    raw_model: DataFrame,
    raw_unk_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    max_n: int = 2,
    keep_empty: bool = True,
) -> DataFrame:
    """:func:`dsir_weights` over hashed n-gram features — the paper's
    feature space.  ``target_model``/``raw_model`` come from
    :func:`train_hashed_ngram_model` with the SAME ``n_buckets`` /
    ``max_n`` (different values silently mis-bucket; the models are
    bucket-keyed so there is nothing to cross-check at runtime).

    Output schema matches :func:`dsir_weights`
    (``id, n_lm_tokens, logw_micro`` — ``n_lm_tokens`` counts feature
    occurrences here).  The combined model table is at most
    ``n_buckets`` rows, so it is ALWAYS broadcast — the one join in
    the plan is a fixed-size dictionary lookup regardless of corpus
    size, which is the whole scale argument for hashing the features.
    """
    combined = F.broadcast(
        target_model.select(
            "bucket", F.col("logp_micro").alias("__lp_t")
        ).join(
            raw_model.select("bucket", F.col("logp_micro").alias("__lp_r")),
            "bucket",
            "full_outer",
        )
    )
    feat = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            hashed_ngram_ids(text_col, n_buckets, max_n)
        ).alias("bucket"),
    )
    per = (
        feat.join(combined, "bucket", "left")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_lm_tokens"),
            F.sum(
                F.coalesce(F.col("__lp_t"), F.lit(int(target_unk_micro)))
                - F.coalesce(F.col("__lp_r"), F.lit(int(raw_unk_micro)))
            ).alias("logw_micro"),
        )
    )
    if not keep_empty:
        return per.select(
            F.col("__id").alias(id_col), "n_lm_tokens", "logw_micro"
        )
    base = docs.select(F.col(id_col).alias("__id"))
    return base.join(per, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_lm_tokens"), F.lit(0)).alias("n_lm_tokens"),
        F.col("logw_micro"),
    )


def dsir_select_hashed(
    docs: DataFrame,
    target_model: DataFrame,
    target_unk_micro: int,
    raw_model: DataFrame,
    raw_unk_micro: int,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    max_n: int = 2,
    seed: int = 0,
) -> DataFrame:
    """:func:`dsir_select` with hashed n-gram features: identical
    Gumbel-top-k keying discipline (exact BIGINT keys, deterministic
    per seed, TakeOrderedAndProject ranking), weights from
    :func:`dsir_weights_hashed`."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    _require_numeric_id(docs, id_col, "dsir_select_hashed")
    weighted = dsir_weights_hashed(
        docs, target_model, target_unk_micro, raw_model, raw_unk_micro,
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        max_n=max_n, keep_empty=False,
    )
    keyed = weighted.withColumn(
        "key_micro", F.col("logw_micro") + gumbel_micro(id_col, seed)
    )
    return keyed.orderBy(
        F.col("key_micro").desc(), F.col(id_col).asc()
    ).limit(int(k))


def temperature_mix_weights(
    docs: DataFrame,
    group_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Multinomial temperature-sampling mix weights — the standard
    low-resource upsampling rule for multilingual / multi-source
    pretraining (Lample & Conneau, "Cross-lingual Language Model
    Pretraining", NeurIPS'19 §3.1; XLM-R keeps alpha=0.3): a group
    holding share ``p_g`` of the corpus is sampled with probability

        q_g = p_g^alpha / sum_h p_h^alpha

    so tail groups are upsampled (q_g > p_g) and head groups damped,
    with ``alpha=1`` recovering proportional sampling and ``alpha=0``
    the uniform mix.

    Output (one row per non-NULL group): ``group_col, n_docs,
    weight_micro, boost_micro`` — ``weight_micro`` is q_g in exact
    micro fixed point, ``boost_micro`` the per-group sampling boost
    q_g/p_g (the expected-epochs multiplier a sampler actually
    applies).  Determinism follows the repo's micro-logp discipline:
    the single transcendental ``p^alpha = exp(alpha * ln p)`` sees a
    bit-identical dyadic input everywhere and is quantized to BIGINT
    micro the moment it is born, the normalizer is the exact integer
    sum of those micros, and every later ratio is a division of
    exactly-representable values — a last-ulp exp/ln discrepancy
    between engines would have to land within ~1e-11 of a micro
    rounding boundary to change any integer (the same accepted odds
    as ``gumbel_micro``; note this leg leans on ``exp`` as well as
    ``ln``), so the SQL mirror (:func:`temperature_mix_sql`) agrees
    in practice and is hash-gated every round.

    Scale shape: ONE count aggregation over the corpus; everything
    after runs on the groups table (metadata-scale — languages,
    sources), with the two normalizers as broadcast one-row frames
    (no whole-frame window, so no single-partition WindowExec).  At
    100 TB the counts come out of the daily telemetry pass; the
    weights table is then broadcast into the sampler.
    """
    counts = (
        docs.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    totals = counts.agg(
        F.sum("n_docs").cast("bigint").alias("__total")
    )
    p = F.col("n_docs").cast("double") / F.col("__total").cast("double")
    s_micro = F.round(
        F.exp(F.lit(float(alpha)) * F.log(p)) * F.lit(float(MICRO))
    ).cast("bigint")
    staged = counts.crossJoin(F.broadcast(totals)).select(
        group_col, "n_docs", "__total", s_micro.alias("__s")
    )
    zrow = staged.agg(F.sum("__s").cast("bigint").alias("__z"))
    joined = staged.crossJoin(F.broadcast(zrow))
    weight = F.round(
        F.col("__s").cast("double") * F.lit(float(MICRO))
        / F.col("__z").cast("double")
    ).cast("bigint")
    boost = F.round(
        F.col("__s").cast("double") / F.col("__z").cast("double")
        * (F.col("__total").cast("double") / F.col("n_docs").cast("double"))
        * F.lit(float(MICRO))
    ).cast("bigint")
    return joined.select(
        group_col,
        "n_docs",
        weight.alias("weight_micro"),
        boost.alias("boost_micro"),
    )


def temperature_mix_sql(
    table: str, group_sql: str, alpha: float = 0.3, where: str = "TRUE"
) -> str:
    """DuckDB mirror of :func:`temperature_mix_weights` — textually the
    same arithmetic in the same order (exp/ln quantized to micro at
    birth, integer normalizer, exact-input divisions)."""
    a = float(alpha)
    return f"""
SELECT grp, n_docs,
       CAST(round(s::DOUBLE * {MICRO}.0 / z::DOUBLE) AS BIGINT)
         AS weight_micro,
       CAST(round(s::DOUBLE / z::DOUBLE
                  * (total::DOUBLE / n_docs::DOUBLE) * {MICRO}.0) AS BIGINT)
         AS boost_micro
FROM (
  SELECT grp, n_docs, total,
         CAST(round(exp({a!r} * ln(n_docs::DOUBLE / total::DOUBLE))
                    * {MICRO}.0) AS BIGINT) AS s,
         SUM(CAST(round(exp({a!r} * ln(n_docs::DOUBLE / total::DOUBLE))
                        * {MICRO}.0) AS BIGINT)) OVER () AS z
  FROM (
    SELECT grp, n_docs, SUM(n_docs) OVER () AS total
    FROM (SELECT {group_sql} AS grp, count(*)::BIGINT AS n_docs
          FROM {table} WHERE ({where}) AND {group_sql} IS NOT NULL
          GROUP BY 1)))
"""


def apply_mix_weights(
    docs: DataFrame,
    weights: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Materialize a temperature-mixed corpus from
    :func:`temperature_mix_weights`' output — the sampler that applies
    the boost: every row of group g is replicated to

        k(id) = boost_micro // 1e6
              + [mix(id, seed) % 1e6  <  boost_micro % 1e6]

    copies, so E[copies] = boost_micro / 1e6 EXACTLY per group and the
    whole decision is integer arithmetic over the portable LCG hash
    (deterministic, reproducible on any engine; the ``% 1e6`` fold of
    the mod-(2^31-1) hash carries ~0.02% non-uniformity — noise next
    to sampling variance).  ``boost < 1`` downsamples (k ∈ {0, 1}),
    ``boost > 1`` upsamples into integer epochs.  Output: the input
    columns plus ``epoch`` (0-based copy index — shuffle epochs apart
    downstream with ``ordering.corpus_shuffle``).

    ``id_col`` must be an integer id (the portable-hash contract);
    groups absent from ``weights`` are dropped (the weights table from
    ``temperature_mix_weights`` covers every non-NULL group).

    Scale shape: broadcast the metadata-scale weights table, map-only
    replicate — no shuffle, no window.
    """
    from sparkall_spark.operators.sampling import _mix

    _require_numeric_id(docs, id_col, "apply_mix_weights")
    j = docs.join(
        F.broadcast(weights.select(group_col, "boost_micro")),
        group_col,
        "inner",
    )
    whole = F.floor(
        F.col("boost_micro") / F.lit(float(MICRO))
    ).cast("int")
    frac_micro = F.pmod(F.col("boost_micro"), F.lit(MICRO))
    extra = (
        F.pmod(_mix(F.col(id_col), seed), F.lit(MICRO)) < frac_micro
    ).cast("int")
    k = whole + extra
    return (
        j.select(
            *docs.columns,
            F.posexplode(
                F.array_repeat(F.lit(0), k)
            ).alias("epoch", "__zero"),
        )
        .drop("__zero")
    )
