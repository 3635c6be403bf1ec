"""Naive-Bayes quality classifier (operators/classifier.py): DuckDB
training+scoring mirror, separation properties, exact-integer filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.classifier import (
    nb_quality_filter,
    nb_score,
    nb_threshold_micro,
    train_nb_classifier,
)
from tests.conftest import assert_matches_oracle

_TOK = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"

# full mirror: train on the doc_id%2=0 slice (lang='en' positive),
# score every document — counts are exact ints, log-odds quantized at
# 1e6 exactly like the engine
_ORACLE = f"""
WITH lab AS (
  SELECT doc_id, text, lang = 'en' AS pos FROM documents WHERE doc_id % 2 = 0),
feats AS (SELECT pos, unnest({_TOK}) AS feature FROM lab),
counts AS (
  SELECT feature,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
         sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS c_neg
  FROM feats GROUP BY feature),
tot AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg, count(*) AS v
        FROM counts),
nn AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
              sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS n_neg FROM lab),
model AS (
  SELECT feature,
         CAST(round((ln((c_pos + 1.0) / (t_pos + v + 1))
                     - ln((c_neg + 1.0) / (t_neg + v + 1))) * 1000000)
              AS BIGINT) AS w
  FROM counts, tot),
unk AS (
  SELECT CAST(round((ln(1.0 / (t_pos + v + 1))
                     - ln(1.0 / (t_neg + v + 1))) * 1000000) AS BIGINT) AS u
  FROM tot),
prior AS (
  SELECT CAST(round(ln(n_pos::DOUBLE / n_neg) * 1000000) AS BIGINT) AS p
  FROM nn),
fx AS (SELECT doc_id, unnest({_TOK}) AS feature FROM documents),
per AS (
  SELECT fx.doc_id, count(*) AS n_features,
         CAST(sum(coalesce(m.w, unk.u)) AS BIGINT) AS s
  FROM fx LEFT JOIN model m USING (feature), unk
  GROUP BY fx.doc_id)
SELECT d.doc_id, coalesce(per.n_features, 0) AS n_features,
       coalesce(per.s, 0) + prior.p AS log_odds_micro
FROM documents d LEFT JOIN per USING (doc_id), prior
"""


def test_train_score_matches_oracle(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "pos", F.col("lang") == "en"
    )
    model, unk, prior = train_nb_classifier(labeled, "pos")
    out = nb_score(docs, model, unk, prior).select(
        "doc_id", "n_features", "log_odds_micro"
    )
    assert_matches_oracle(out, duck, _ORACLE)


def test_separates_planted_classes(spark):
    good = [(i, "the quick brown fox reads fine prose daily", True)
            for i in range(20)]
    bad = [(100 + i, "zzz spam click buy now winner casino jackpot", False)
           for i in range(20)]
    mixed = spark.createDataFrame(
        good + bad, "doc_id long, text string, pos boolean"
    )
    model, unk, prior = train_nb_classifier(mixed, "pos")
    probe = spark.createDataFrame(
        [(1, "quick fox prose"), (2, "casino jackpot spam")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in nb_score(probe, model, unk, prior).collect()}
    assert rows[1]["prob_pos"] > 0.9
    assert rows[2]["prob_pos"] < 0.1
    kept = nb_quality_filter(probe, model, unk, prior, min_prob=0.5)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_integer_filter_equals_float_definition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "pos", F.col("lang") == "en"
    )
    model, unk, prior = train_nb_classifier(labeled, "pos")
    p = 0.41
    kept = {
        r["doc_id"]
        for r in nb_quality_filter(
            docs, model, unk, prior, min_prob=p
        ).select("doc_id").collect()
    }
    scored = nb_score(docs, model, unk, prior).collect()
    t = nb_threshold_micro(p)
    expect = {r["doc_id"] for r in scored if r["log_odds_micro"] >= t}
    assert kept == expect
    # float-definition cross-check away from quantization boundaries
    for r in scored:
        if abs(r["log_odds_micro"] - t) > 2:
            assert (r["doc_id"] in kept) == (r["prob_pos"] >= p)


def test_bigram_features_see_word_order(spark):
    ref = [(1, "man bites dog shock report", True),
           (2, "dog bites man routine event", False)]
    labeled = spark.createDataFrame(
        ref * 5, "doc_id long, text string, pos boolean"
    )
    probe = spark.createDataFrame(
        [(10, "man bites dog"), (11, "dog bites man")],
        "doc_id long, text string",
    )
    m1, u1, p1 = train_nb_classifier(labeled, "pos", ngram=1)
    s1 = {r["doc_id"]: r["log_odds_micro"]
          for r in nb_score(probe, m1, u1, p1, ngram=1).collect()}
    assert s1[10] == s1[11]  # unigram model is order-blind
    m2, u2, p2 = train_nb_classifier(labeled, "pos", ngram=2)
    s2 = {r["doc_id"]: r["log_odds_micro"]
          for r in nb_score(probe, m2, u2, p2, ngram=2).collect()}
    assert s2[10] > s2[11]  # bigram model is not


def test_min_count_prunes_but_keeps_probability_space(spark):
    labeled = spark.createDataFrame(
        [(1, "common common rare_pos", True), (2, "common common", False)],
        "doc_id long, text string, pos boolean",
    )
    full, unk, prior = train_nb_classifier(labeled, "pos", min_count=1)
    pruned, unk2, prior2 = train_nb_classifier(labeled, "pos", min_count=2)
    assert (unk, prior) == (unk2, prior2)  # totals unchanged by pruning
    assert pruned.count() < full.count()
    assert [r["feature"] for r in pruned.collect()] == ["common"]


def test_validation(spark):
    one_class = spark.createDataFrame(
        [(1, "a", True)], "doc_id long, text string, pos boolean"
    )
    with pytest.raises(ValueError):
        train_nb_classifier(one_class, "pos")
    both = spark.createDataFrame(
        [(1, "a", True), (2, "b", False)],
        "doc_id long, text string, pos boolean",
    )
    model, unk, prior = train_nb_classifier(both, "pos")
    with pytest.raises(ValueError):
        nb_quality_filter(both, model, unk, prior, min_prob=1.0)


def test_plan_no_udf(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "pos", F.col("lang") == "en"
    )
    model, unk, prior = train_nb_classifier(labeled, "pos")
    plan = (
        nb_score(docs, model, unk, prior)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_classifier_knob(spark, sf_dir):
    from sparkall_spark.operators.pipeline import prepare_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", F.col("lang") == "en"
    )
    base = prepare_documents(docs, min_quality=0.0)
    gated = prepare_documents(
        docs,
        min_quality=0.0,
        classifier_labeled=labeled,
        classifier_min_prob=0.6,
    )
    nb, ng = base.count(), gated.count()
    assert 0 < ng < nb  # the gate filters non-vacuously both ways
    # gated result == base filtered by the classifier on its own
    from sparkall_spark.operators.classifier import (
        nb_quality_filter,
        train_nb_classifier,
    )

    model, unk, prior = train_nb_classifier(labeled, "label")
    expect = {
        r["doc_id"]
        for r in nb_quality_filter(
            base, model, unk, prior, min_prob=0.6
        ).select("doc_id").collect()
    }
    assert {r["doc_id"] for r in gated.select("doc_id").collect()} == expect


def test_pipeline_lr_classifier_knob(spark, sf_dir):
    """classifier_kind='lr' gates on the integer LR margin; equals
    training + scoring the same model by hand."""
    import math

    from sparkall_spark.operators._cache import release_caches
    from sparkall_spark.operators.logreg import logreg_score, train_logreg
    from sparkall_spark.operators.pipeline import prepare_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", (F.col("lang") == "en").cast("int")
    )
    base = prepare_documents(docs, min_quality=0.0)
    gated = prepare_documents(
        docs,
        min_quality=0.0,
        classifier_labeled=labeled,
        classifier_min_prob=0.55,
        classifier_kind="lr",
        classifier_lr_buckets=64,
        classifier_lr_iters=3,
    )
    got = {r["doc_id"] for r in gated.select("doc_id").collect()}
    release_caches()
    w, b = train_logreg(labeled, "label", n_buckets=64, iters=3)
    cut = int(round(math.log(0.55 / 0.45) * 1_000_000))
    expect = {
        r["doc_id"]
        for r in logreg_score(base, w, b)
        .filter(F.col("margin_micro") >= cut)
        .collect()
    }
    release_caches()
    assert got == expect
    assert len(got) < base.count()  # non-vacuous gate

    import pytest as _pytest

    with _pytest.raises(ValueError, match="'nb' or 'lr'"):
        prepare_documents(
            docs, classifier_labeled=labeled, classifier_kind="svm"
        )
    with _pytest.raises(ValueError, match="ngram"):
        prepare_documents(
            docs, classifier_labeled=labeled, classifier_kind="lr",
            classifier_ngram=2,
        )
