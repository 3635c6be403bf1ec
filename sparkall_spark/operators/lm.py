"""N-gram language-model scoring for corpus quality filtering.

CCNet-style (Wenzek et al. 2020) pipeline stage, reduced to its
distributable core: train a smoothed unigram LM on a trusted reference
corpus, score every candidate document by its per-token log-likelihood
under that model, and filter on the score (high perplexity = unlike the
reference = low quality).  No external LM toolkit: the model IS a
DataFrame.

Exactness design: per-token log-probabilities are quantized to integer
**micro-logp** (``round(ln(p) * 1e6)`` as BIGINT) at model build time.
Document scores are then exact integer sums — order-independent, so
bit-identical across partitionings, reruns, and engines (a float sum
over a shuffle is none of those).  The float ``avg_logp`` /
``perplexity`` columns are derived from the exact integers at the end.

Scale design: the model is vocabulary-sized (token, logp) — built with
one map-side-combined groupBy over the reference corpus plus a single
two-number aggregate to the driver (total count + vocab size, needed
for the smoothing denominator).  Scoring explodes candidate tokens
map-side, joins the (broadcast) model, and reassembles per document
with one shuffle keyed by doc id.  Set ``broadcast=False`` when the
vocabulary outgrows the broadcast threshold — the join then shuffles
on the token key instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from sparkall_spark.functions.text import tokens
from sparkall_spark.operators._cache import persist_tracked

MICRO = 1_000_000


def train_unigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, int]:
    """Add-one-smoothed unigram LM from a reference corpus.

    Returns ``(model, unk_logp_micro)``: the model has one row per
    distinct lowercase token with ``logp_micro`` (BIGINT micro-logp)
    and ``logp`` (the float it quantizes); unseen tokens score
    ``unk_logp_micro = round(ln(1 / (total + V + 1)) * 1e6)``.

    The only driver-side data is the two-number totals row; token
    counting is a distributed map-side-combined aggregation.

    The counts table is persisted (released via
    ``operators._cache.release_caches``): the totals pass below
    materializes it, so the model's later broadcast/shuffle build reads
    the cache instead of re-tokenizing the reference corpus — training
    touches the corpus ONCE, which at real scale halves the cost of
    every ``train_*`` call (the model is vocabulary-sized, far smaller
    than the corpus it summarizes).
    """
    counts = persist_tracked(
        ref.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
    )
    total, vocab = counts.agg(
        F.sum("count").cast("long"), F.count("*").cast("long")
    ).first()
    denom = float((total or 0) + (vocab or 0) + 1)
    logp = F.log((F.col("count") + F.lit(1)).cast("double") / F.lit(denom))
    model = counts.select(
        "token",
        F.round(logp * MICRO).cast("long").alias("logp_micro"),
        logp.alias("logp"),
    )
    unk = int(round(math.log(1.0 / denom) * MICRO))
    return model, unk


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    unk_logp_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Score each document under a trained unigram LM.

    Output per input row: ``(id_col, n_lm_tokens, sum_logp_micro,
    avg_logp, perplexity)``.  ``sum_logp_micro`` is the exact integer
    sum of per-token micro-logps (unknown tokens take the UNK score) —
    the deterministic column to gate on; ``avg_logp`` and
    ``perplexity = exp(-avg_logp)`` are float conveniences.  Documents
    with zero tokens keep a row with n=0 and NULL avg/perplexity.
    """
    m = model.select("token", "logp_micro")
    if broadcast:
        m = F.broadcast(m)
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    per = (
        tok.join(m, "token", "left")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_lm_tokens"),
            F.sum(
                F.coalesce(F.col("logp_micro"), F.lit(int(unk_logp_micro)))
            ).alias("sum_logp_micro"),
        )
    )
    base = docs.select(F.col(id_col).alias("__id"))
    out = base.join(per, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_lm_tokens"), F.lit(0)).alias("n_lm_tokens"),
        F.coalesce(F.col("sum_logp_micro"), F.lit(0)).alias("sum_logp_micro"),
    )
    avg = F.when(
        F.col("n_lm_tokens") > 0,
        F.col("sum_logp_micro").cast("double")
        / (F.col("n_lm_tokens") * F.lit(float(MICRO))),
    )
    return out.withColumn("avg_logp", avg).withColumn(
        "perplexity", F.exp(-F.col("avg_logp"))
    )


def lm_quality_filter(
    docs: DataFrame,
    model: DataFrame,
    unk_logp_micro: int,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Keep documents whose LM perplexity is at most ``max_perplexity``
    (and that have at least one token).  Returns the original columns.

    The comparison runs in the exact integer domain:
    ``perplexity <= P``  ⇔  ``avg_logp >= -ln(P)``  ⇔
    ``sum_logp_micro >= -round(ln(P)*1e6) * n_lm_tokens`` — the
    threshold is quantized ONCE on the driver, so the predicate is pure
    BIGINT arithmetic with no float boundary for engines to disagree on.
    """
    t_micro = int(round(math.log(float(max_perplexity)) * MICRO))
    scored = lm_score(
        docs, model, unk_logp_micro, id_col=id_col, text_col=text_col,
        broadcast=broadcast,
    ).select(id_col, "n_lm_tokens", "sum_logp_micro")
    keep = scored.filter(
        (F.col("n_lm_tokens") > 0)
        & (
            F.col("sum_logp_micro")
            >= F.lit(-t_micro) * F.col("n_lm_tokens")
        )
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def lm_threshold_micro(max_perplexity: float) -> int:
    """The quantized ``round(ln(P) * 1e6)`` threshold — exposed so SQL
    mirrors can embed the identical integer literal."""
    return int(round(math.log(float(max_perplexity)) * MICRO))


# --- interpolated bigram LM (r4) ------------------------------------------

def _positions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per token position: (id, prev, w); prev is NULL at the
    first position.  Map-side only — consecutive pairs come from the
    token array itself, no window or self-join."""
    toks = tokens(F.lower(F.col(text_col)))
    idx = F.when(
        F.size(toks) >= 1, F.sequence(F.lit(1), F.size(toks))
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.when(i > 1, F.element_at(toks, i - 1)).alias("prev"),
            F.element_at(toks, i).alias("w"),
        ),
    )
    return df.select(
        F.col(id_col).alias("__id"), F.explode(pairs).alias("p")
    ).select("__id", F.col("p.prev").alias("prev"), F.col("p.w").alias("w"))


def train_bigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, float]:
    """Interpolated-bigram model pieces from a reference corpus:
    ``(bigrams, unigrams, pu_unk)`` where ``bigrams`` is
    ``(prev, w, pb)`` with MLE ``pb = c(prev,w)/c(prev·)`` (no
    smoothing — interpolation with the unigram handles zeros),
    ``unigrams`` is ``(w, pu)`` with add-one ``pu = (c+1)/(total+V+1)``,
    and ``pu_unk`` the unseen-token unigram probability.  Probabilities
    are exact integer ratios evaluated in double — identical on every
    engine — so a SQL mirror reproduces scoring bit-for-bit (up to the
    accepted last-ulp-of-ln class).  Both tables are vocabulary-scale;
    the only driver-side data is the two-number totals row.

    ``pos`` (the exploded corpus positions) feeds THREE aggregations
    (unigram counts, bigram counts, context counts) and ``uni`` feeds
    two (totals + the model) — both are persisted so the reference
    corpus is tokenized exactly once per training call (released via
    ``operators._cache.release_caches``)."""
    pos = persist_tracked(_positions(ref, ref.columns[0], text_col))
    uni = persist_tracked(pos.groupBy("w").agg(F.count("*").alias("c")))
    total, vocab = uni.agg(
        F.sum("c").cast("long"), F.count("*").cast("long")
    ).first()
    denom = float((total or 0) + (vocab or 0) + 1)
    unigrams = uni.select(
        "w", ((F.col("c") + F.lit(1)).cast("double") / F.lit(denom)).alias("pu")
    )
    pairs = pos.filter(F.col("prev").isNotNull())
    big = pairs.groupBy("prev", "w").agg(F.count("*").alias("c2"))
    ctx = pairs.groupBy("prev").agg(F.count("*").alias("c1"))
    bigrams = big.join(ctx, "prev").select(
        "prev", "w", (F.col("c2").cast("double") / F.col("c1")).alias("pb")
    )
    return bigrams, unigrams, 1.0 / denom


def bigram_lm_score(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    pu_unk: float,
    lam: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Score documents under the interpolated bigram LM:
    ``p(w_i) = lam * pb(w_i | w_{i-1}) + (1-lam) * pu(w_i)`` (first
    token and unseen contexts fall back to the unigram term, which is
    never zero).  Same exact-integer contract as :func:`lm_score`:
    per-token micro-logps quantized once, summed as BIGINTs — output
    ``(id_col, n_lm_tokens, sum_logp_micro, avg_logp, perplexity)``.

    Prefer ``lam`` values exactly representable in binary (0.75, 0.5)
    so the ``1-lam`` complement is exact too and SQL mirrors can embed
    both as literals.  Scale: two broadcast joins (set
    ``broadcast=False`` to shuffle on token keys instead) + one
    doc-keyed shuffle; the position expansion is map-side.
    """
    uni = unigrams.select("w", "pu")
    big = bigrams.select("prev", "w", "pb")
    if broadcast:
        uni, big = F.broadcast(uni), F.broadcast(big)
    pos = _positions(docs, id_col, text_col)
    j = pos.join(uni, "w", "left").join(big, ["prev", "w"], "left")
    pu_eff = F.coalesce(F.col("pu"), F.lit(float(pu_unk)))
    p = F.when(F.col("prev").isNull(), pu_eff).otherwise(
        F.lit(float(lam)) * F.coalesce(F.col("pb"), F.lit(0.0))
        + F.lit(float(1 - lam)) * pu_eff
    )
    per = j.groupBy("__id").agg(
        F.count("*").alias("n_lm_tokens"),
        F.sum(F.round(F.log(p) * MICRO).cast("long")).alias("sum_logp_micro"),
    )
    base = docs.select(F.col(id_col).alias("__id"))
    out = base.join(per, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_lm_tokens"), F.lit(0)).alias("n_lm_tokens"),
        F.coalesce(F.col("sum_logp_micro"), F.lit(0)).alias("sum_logp_micro"),
    )
    avg = F.when(
        F.col("n_lm_tokens") > 0,
        F.col("sum_logp_micro").cast("double")
        / (F.col("n_lm_tokens") * F.lit(float(MICRO))),
    )
    return out.withColumn("avg_logp", avg).withColumn(
        "perplexity", F.exp(-F.col("avg_logp"))
    )
