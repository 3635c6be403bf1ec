"""Quality classification by multinomial Naive Bayes log-odds.

The GPT-3/LLaMA-family pipelines gate pretraining text with a linear
bag-of-words classifier trained on "good" (reference) vs "bad"
(random crawl) examples.  This module implements the closed-form
member of that family — binary multinomial Naive Bayes with add-one
smoothing — because its training is exactly two token-count
aggregations (no SGD, no iteration, no float accumulation ordering),
which makes both training and scoring reproducible bit-for-bit on any
engine: the spirit of ``operators/lm.py`` applied to classification.
A trained model scores identically to a logistic-regression linear
scorer (weights = per-token log-odds, bias = class prior).

Exactness: per-token log-odds are quantized ONCE at model build to
integer micro units (``round(x * 1e6)`` BIGINT).  A document's score
is the exact integer sum ``prior + Σ w(t_i)`` — order/partitioning/
engine independent — and the keep-predicate runs in the integer
domain (``P(pos) >= p``  ⇔  ``log_odds_micro >= round(ln(p/(1-p))*1e6)``).

Scale: the model is vocabulary-sized (one map-side-combined groupBy
over the labeled corpus); the only driver-side data is a four-number
totals row.  Scoring = map-side token explode + broadcast model join +
one doc-keyed shuffle (``broadcast=False`` switches to a token-key
shuffle join when the vocabulary outgrows the broadcast limit).
``min_count`` prunes hapax features — the standard way to keep the
model broadcastable as the training set grows.  Word-bigram features
(``ngram=2``) add fasttext-style order sensitivity at ~2x model size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from sparkall_spark.functions.text import tokens

MICRO = 1_000_000


def _features(text: Column, ngram: int) -> Column:
    """Unigram (+ optional ``w1_w2`` bigram) features, lowercased.
    Occurrence-weighted (multinomial NB counts repeats)."""
    toks = tokens(F.lower(text))
    if ngram <= 1:
        return toks
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                "_", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def train_nb_classifier(
    labeled: DataFrame,
    label_col: str,
    text_col: str = "text",
    ngram: int = 1,
    min_count: int = 1,
) -> tuple[DataFrame, int, int]:
    """Train binary multinomial NB from ``labeled`` (``label_col`` must
    be boolean-like: true = positive/"good").

    Returns ``(model, unk_w_micro, prior_micro)``: ``model`` has one
    row per feature with ``w_micro`` (BIGINT micro log-odds
    ``ln(p(t|pos)) - ln(p(t|neg))``, add-one smoothed) and the float
    ``w`` it quantizes; ``unk_w_micro`` scores features unseen in
    training; ``prior_micro`` is the quantized class-prior log-odds
    ``ln(N_pos / N_neg)``.

    Smoothing denominators use the UNION vocabulary (V features), so
    positive-only and negative-only features get honest opposing
    weights.  ``min_count`` drops features with total count < its value
    AFTER the totals are taken (pruning shrinks the model, not the
    probability space — scores of pruned features fall back to UNK).
    """
    lab = F.col(label_col).cast("boolean")
    feats = labeled.select(
        lab.alias("__pos"),
        F.explode(_features(F.col(text_col), ngram)).alias("feature"),
    )
    counts = feats.groupBy("feature").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(~F.col("__pos"), 1).otherwise(0)).alias("c_neg"),
    )
    t_pos, t_neg, vocab = counts.agg(
        F.sum("c_pos").cast("long"),
        F.sum("c_neg").cast("long"),
        F.count("*").cast("long"),
    ).first()
    n_pos, n_neg = (
        labeled.agg(
            F.sum(F.when(lab, 1).otherwise(0)).cast("long"),
            F.sum(F.when(~lab, 1).otherwise(0)).cast("long"),
        ).first()
    )
    if not n_pos or not n_neg:
        raise ValueError(
            f"need both classes: n_pos={n_pos}, n_neg={n_neg}"
        )
    d_pos = float((t_pos or 0) + (vocab or 0) + 1)
    d_neg = float((t_neg or 0) + (vocab or 0) + 1)
    w = F.log((F.col("c_pos") + 1).cast("double") / F.lit(d_pos)) - F.log(
        (F.col("c_neg") + 1).cast("double") / F.lit(d_neg)
    )
    model = (
        counts.filter((F.col("c_pos") + F.col("c_neg")) >= min_count)
        .select(
            "feature",
            F.round(w * MICRO).cast("long").alias("w_micro"),
            w.alias("w"),
        )
    )
    unk = int(round((math.log(1.0 / d_pos) - math.log(1.0 / d_neg)) * MICRO))
    prior = int(round(math.log(n_pos / n_neg) * MICRO))
    return model, unk, prior


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    unk_w_micro: int,
    prior_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """Score documents: ``(id_col, n_features, log_odds_micro,
    prob_pos)``.  ``log_odds_micro`` is the exact integer
    ``prior + Σ w(feature)`` (unseen features take UNK) — the
    deterministic gating column; ``prob_pos`` is its float sigmoid.
    Zero-token documents score the prior alone."""
    m = model.select("feature", "w_micro")
    if broadcast:
        m = F.broadcast(m)
    fx = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(_features(F.col(text_col), ngram)).alias("feature"),
    )
    per = (
        fx.join(m, "feature", "left")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_features"),
            F.sum(
                F.coalesce(F.col("w_micro"), F.lit(int(unk_w_micro)))
            ).alias("__sumw"),
        )
    )
    base = docs.select(F.col(id_col).alias("__id"))
    out = base.join(per, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_features"), F.lit(0)).alias("n_features"),
        (
            F.coalesce(F.col("__sumw"), F.lit(0)) + F.lit(int(prior_micro))
        ).alias("log_odds_micro"),
    )
    z = F.col("log_odds_micro").cast("double") / F.lit(float(MICRO))
    return out.withColumn("prob_pos", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def nb_quality_filter(
    docs: DataFrame,
    model: DataFrame,
    unk_w_micro: int,
    prior_micro: int,
    min_prob: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """Keep documents with ``P(pos) >= min_prob`` — evaluated as a pure
    BIGINT comparison (threshold logit quantized once on the driver),
    so the cut has no float boundary for engines to disagree on."""
    if not 0.0 < min_prob < 1.0:
        raise ValueError(f"min_prob must be in (0, 1), got {min_prob}")
    t = nb_threshold_micro(min_prob)
    scored = nb_score(
        docs, model, unk_w_micro, prior_micro,
        id_col=id_col, text_col=text_col, ngram=ngram, broadcast=broadcast,
    ).select(id_col, "log_odds_micro")
    keep = scored.filter(F.col("log_odds_micro") >= F.lit(t)).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def nb_threshold_micro(min_prob: float) -> int:
    """``round(ln(p/(1-p)) * 1e6)`` — exposed so SQL mirrors embed the
    identical integer literal."""
    return int(round(math.log(min_prob / (1.0 - min_prob)) * MICRO))
