"""Unigram-LM corpus scoring (operators/lm.py): CCNet-style perplexity
quality filtering with exact integer micro-logp arithmetic.  DuckDB
mirrors reproduce the model build + scoring bit-for-bit."""

import math

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators import lm as L
from tests.conftest import assert_matches_oracle

TOK = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"

# the e20/e25 mirror: train on the doc_id%5 reference slice, score all
LM_SCORE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOK}) AS token FROM documents),
ref AS (
  SELECT token, count(*) AS c FROM tok WHERE doc_id % 5 = 0 GROUP BY token),
tot AS (SELECT sum(c) AS total, count(*) AS v FROM ref),
model AS (
  SELECT token,
         CAST(round(ln((c + 1.0) / (total + v + 1)) * 1000000) AS BIGINT)
           AS lp
  FROM ref, tot),
unk AS (
  SELECT CAST(round(ln(1.0 / (total + v + 1)) * 1000000) AS BIGINT) AS u
  FROM tot),
per AS (
  SELECT t.doc_id,
         count(*) AS n_lm_tokens,
         CAST(sum(coalesce(m.lp, unk.u)) AS BIGINT) AS sum_logp_micro
  FROM tok t LEFT JOIN model m USING (token), unk
  GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(coalesce(per.n_lm_tokens, 0) AS BIGINT) AS n_lm_tokens,
       CAST(coalesce(per.sum_logp_micro, 0) AS BIGINT) AS sum_logp_micro
FROM documents d LEFT JOIN per USING (doc_id)
"""


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_train_model_counts_and_smoothing(spark):
    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog the cat")], ["doc_id", "text"]
    )
    model, unk = L.train_unigram_lm(ref)
    rows = {r["token"]: r["logp_micro"] for r in model.collect()}
    # total=7 tokens, vocab=4 -> denom=12
    assert set(rows) == {"the", "cat", "sat", "dog"}
    assert rows["the"] == round(math.log(4 / 12) * 1e6)
    assert rows["sat"] == round(math.log(2 / 12) * 1e6)
    assert unk == round(math.log(1 / 12) * 1e6)


def test_lm_score_exact_integers_and_unknowns(spark):
    ref = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    model, unk = L.train_unigram_lm(ref)
    # denom = 3 + 2 + 1 = 6; logp(a)=ln(3/6), logp(b)=ln(2/6), unk=ln(1/6)
    docs = spark.createDataFrame(
        [(10, "a b z"), (11, ""), (12, "A  a")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_lm_tokens"], r["sum_logp_micro"], r["perplexity"])
        for r in L.lm_score(docs, model, unk).collect()
    }
    lpa = round(math.log(3 / 6) * 1e6)
    lpb = round(math.log(2 / 6) * 1e6)
    assert out[10][0] == 3 and out[10][1] == lpa + lpb + unk
    assert out[11] == (0, 0, None)  # zero-token doc keeps its row
    assert out[12][0] == 2 and out[12][1] == 2 * lpa  # lowercased tokens
    assert out[10][2] == pytest.approx(
        math.exp(-out[10][1] / (3 * 1e6)), rel=1e-9
    )


def test_lm_score_vs_duckdb_oracle(docs, duck):
    model, unk = L.train_unigram_lm(docs.filter(F.col("doc_id") % 5 == 0))
    out = L.lm_score(docs, model, unk).select(
        "doc_id",
        F.col("n_lm_tokens").cast("bigint").alias("n_lm_tokens"),
        F.col("sum_logp_micro").cast("bigint").alias("sum_logp_micro"),
    )
    assert_matches_oracle(out, duck, LM_SCORE_ORACLE)


def test_lm_quality_filter_orders_by_reference_likeness(spark):
    """A doc made of reference-frequent tokens scores lower perplexity
    than one of unseen tokens, and the exact-integer filter keeps
    exactly the under-threshold ids."""
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        ["doc_id", "text"],
    )
    model, unk = L.train_unigram_lm(ref)
    docs = spark.createDataFrame(
        [(1, "the quick fox"), (2, "zxqv wvut qqqz")], ["doc_id", "text"]
    )
    scored = {r["doc_id"]: r["perplexity"] for r in
              L.lm_score(docs, model, unk).collect()}
    assert scored[1] < scored[2]
    cut = math.sqrt(scored[1] * scored[2])  # between the two
    kept = L.lm_quality_filter(docs, model, unk, cut)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_lm_filter_matches_float_semantics(spark):
    """The integer-domain predicate equals the float definition
    perplexity <= P for thresholds away from quantization boundaries."""
    ref = spark.createDataFrame([(1, "x y z x y x")], ["doc_id", "text"])
    model, unk = L.train_unigram_lm(ref)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["x", "x y", "z w", "w w w", "x x x"])],
        ["doc_id", "text"],
    )
    scored = L.lm_score(docs, model, unk).collect()
    for p in (2.0, 5.0, 9.0, 20.0):
        kept = {
            r["doc_id"]
            for r in L.lm_quality_filter(docs, model, unk, p).collect()
        }
        expect = {
            r["doc_id"]
            for r in scored
            if r["n_lm_tokens"] > 0 and r["perplexity"] <= p
        }
        assert kept == expect, f"threshold {p}"


def test_lm_plan_is_udf_free_broadcast(docs, spark):
    model, unk = L.train_unigram_lm(docs.limit(50))
    plan = L.lm_score(docs, model, unk)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_lm_scores_invariant_under_partitioning(docs, spark):
    """The micro-logp integer sums are claimed order- and partitioning-
    independent — a float-sum implementation would fail this: the same
    corpus scored through 1 partition and through 13 must agree
    bit-for-bit on every row."""
    model, unk = L.train_unigram_lm(docs.filter(F.col("doc_id") % 5 == 0))
    one = {
        r["doc_id"]: (r["n_lm_tokens"], r["sum_logp_micro"])
        for r in L.lm_score(docs.repartition(1), model, unk).collect()
    }
    many = {
        r["doc_id"]: (r["n_lm_tokens"], r["sum_logp_micro"])
        for r in L.lm_score(docs.repartition(13), model, unk).collect()
    }
    assert one == many


# --- interpolated bigram LM ------------------------------------------------

BIGRAM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {TOK} AS tk FROM documents),
pos AS (
  SELECT doc_id, tk[i] AS w,
         CASE WHEN i > 1 THEN tk[i-1] END AS prev
  FROM t, unnest(generate_series(1, len(tk))) AS s(i)),
uni AS (
  SELECT w, count(*) AS c FROM pos WHERE doc_id % 5 = 0 GROUP BY w),
tot AS (SELECT sum(c) AS total, count(*) AS v FROM uni),
um AS (SELECT w, (c + 1.0) / (total + v + 1) AS pu FROM uni, tot),
unk AS (SELECT 1.0 / (total + v + 1) AS pu_unk FROM tot),
bp AS (
  SELECT prev, w, count(*) AS c2 FROM pos
  WHERE doc_id % 5 = 0 AND prev IS NOT NULL GROUP BY prev, w),
ctx AS (
  SELECT prev, count(*) AS c1 FROM pos
  WHERE doc_id % 5 = 0 AND prev IS NOT NULL GROUP BY prev),
bm AS (SELECT bp.prev, bp.w, bp.c2::DOUBLE / ctx.c1 AS pb
       FROM bp JOIN ctx USING (prev)),
per AS (
  SELECT p.doc_id, count(*) AS n,
         CAST(sum(CAST(round(ln(
           CASE WHEN p.prev IS NULL THEN coalesce(um.pu, unk.pu_unk)
                ELSE 0.75 * coalesce(bm.pb, 0.0)
                     + 0.25 * coalesce(um.pu, unk.pu_unk) END
         ) * 1000000) AS BIGINT)) AS BIGINT) AS s
  FROM pos p
  LEFT JOIN um ON um.w = p.w
  LEFT JOIN bm ON bm.prev = p.prev AND bm.w = p.w
  CROSS JOIN unk
  GROUP BY p.doc_id)
SELECT d.doc_id,
       CAST(coalesce(per.n, 0) AS BIGINT) AS n_lm_tokens,
       CAST(coalesce(per.s, 0) AS BIGINT) AS sum_logp_micro
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""


def test_bigram_model_probabilities(spark):
    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], ["doc_id", "text"]
    )
    big, uni, pu_unk = L.train_bigram_lm(ref)
    pb = {(r["prev"], r["w"]): r["pb"] for r in big.collect()}
    pu = {r["w"]: r["pu"] for r in uni.collect()}
    # bigram pairs: (a,b) x2, (b,a) x1, (a,c) x1 -> ctx a=3, b=1
    assert pb[("a", "b")] == pytest.approx(2 / 3)
    assert pb[("a", "c")] == pytest.approx(1 / 3)
    assert pb[("b", "a")] == 1.0
    # unigrams: a=3, b=2, c=1; total=6, V=3 -> denom=10
    assert pu["a"] == pytest.approx(4 / 10) and pu_unk == pytest.approx(1 / 10)


def test_bigram_score_favors_reference_order(spark):
    """The bigram term distinguishes word ORDER that a unigram model
    cannot: the reference phrase beats its shuffled permutation."""
    import math as _m

    ref = spark.createDataFrame(
        [(i, "new york city hall") for i in range(3)], ["doc_id", "text"]
    )
    big, uni, pu_unk = L.train_bigram_lm(ref)
    docs = spark.createDataFrame(
        [(1, "new york city hall"), (2, "hall city york new")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["perplexity"]
           for r in L.bigram_lm_score(docs, big, uni, pu_unk).collect()}
    assert got[1] < got[2]
    # unigram model sees identical bags -> identical scores
    m, unk = L.train_unigram_lm(ref)
    u = {r["doc_id"]: r["sum_logp_micro"]
         for r in L.lm_score(docs, m, unk).collect()}
    assert u[1] == u[2]


def test_bigram_score_vs_duckdb_oracle(docs, duck):
    big, uni, pu_unk = L.train_bigram_lm(
        docs.filter(F.col("doc_id") % 5 == 0)
    )
    out = L.bigram_lm_score(docs, big, uni, pu_unk, lam=0.75).select(
        "doc_id",
        F.col("n_lm_tokens").cast("bigint").alias("n_lm_tokens"),
        F.col("sum_logp_micro").cast("bigint").alias("sum_logp_micro"),
    )
    assert_matches_oracle(out, duck, BIGRAM_ORACLE)
