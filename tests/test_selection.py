"""Data-selection operators (operators/selection.py): per-stratum token
caps, CCNet perplexity buckets, DSIR importance resampling — each with
a bit-for-bit DuckDB mirror plus semantic/plan contracts."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators import lm as L
from sparkall_spark.operators import selection as S
from tests.conftest import assert_matches_oracle

TOK = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- stratum_token_cap ------------------------------------------------------


def test_stratum_token_cap_oracle(docs, duck):
    out = S.stratum_token_cap(
        docs,
        stratum_col="source",
        n_tokens_col="n_chars",
        token_budget=5_000,
        id_col="doc_id",
        order_col="n_chars",
    ).select("doc_id", "source", "n_chars")
    sql = S.stratum_token_cap_sql(
        "(SELECT doc_id, source, n_chars FROM documents) t",
        stratum_col="source",
        n_tokens_col="n_chars",
        token_budget=5_000,
        id_col="doc_id",
        order_col="n_chars",
    )
    assert_matches_oracle(out, duck, sql)
    # the cap actually bit: something was dropped, something kept
    kept = out.count()
    assert 0 < kept < docs.count()


def test_stratum_token_cap_greedy_prefix_semantics(spark):
    # budget 10, sizes ordered desc: 6 (run=6 keep), 5 (11 drop),
    # 3 (14 drop). Greedy PREFIX — the later 3 is NOT pulled into the
    # gap even though 6+3 would fit (bin packing is not the contract).
    df = spark.createDataFrame(
        [(1, "s", 6), (2, "s", 5), (3, "s", 3)], ["doc_id", "st", "n"]
    )
    out = S.stratum_token_cap(
        df, "st", "n", token_budget=10, id_col="doc_id", order_col="n"
    )
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_stratum_token_cap_oversized_and_per_stratum(spark):
    # a document larger than the whole budget is dropped even alone in
    # its stratum; budgets are independent per stratum
    df = spark.createDataFrame(
        [(1, "a", 50), (2, "b", 4), (3, "b", 4)], ["doc_id", "st", "n"]
    )
    out = S.stratum_token_cap(
        df, "st", "n", token_budget=8, id_col="doc_id", order_col="n"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]


def test_stratum_token_cap_validation(spark):
    df = spark.createDataFrame([(1, "s", 1)], ["doc_id", "st", "n"])
    with pytest.raises(ValueError, match="token_budget"):
        S.stratum_token_cap(df, "st", "n", token_budget=0, id_col="doc_id")


# --- perplexity_buckets -----------------------------------------------------


def _lm_scored(docs):
    ref = docs.filter(F.col("doc_id") % 5 == 0)
    model, unk = L.train_unigram_lm(ref)
    return L.lm_score(docs, model, unk).select(
        "doc_id", "n_lm_tokens", "sum_logp_micro"
    )


SCORED_CTE = f"""
tok AS (
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
  SELECT t.doc_id, count(*) AS n_lm_tokens,
         CAST(sum(coalesce(m.lp, unk.u)) AS BIGINT) AS sum_logp_micro
  FROM tok t LEFT JOIN model m USING (token), unk
  GROUP BY t.doc_id),
scored AS (
  SELECT d.doc_id,
         CAST(coalesce(per.n_lm_tokens, 0) AS BIGINT) AS n_lm_tokens,
         CAST(coalesce(per.sum_logp_micro, 0) AS BIGINT) AS sum_logp_micro
  FROM documents d LEFT JOIN per USING (doc_id))
"""


def test_perplexity_buckets_oracle(docs, duck):
    out = S.perplexity_buckets(_lm_scored(docs))
    sql = "WITH " + SCORED_CTE + S.perplexity_buckets_sql("scored")
    assert_matches_oracle(out, duck, sql)


def test_perplexity_buckets_tercile_counts(docs):
    out = S.perplexity_buckets(_lm_scored(docs))
    counts = {
        r["bucket"]: r["n"]
        for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    n = sum(counts.values())
    # exact rank terciles: bucket sizes differ by at most 1 (plus any
    # zero-token docs, which all land in tail)
    assert set(counts) <= {"head", "middle", "tail"}
    assert abs(counts["head"] - n / 3) <= counts.get("tail", 0) + 1


def test_perplexity_buckets_thresholds_map_only(spark):
    scored = spark.createDataFrame(
        [(1, 10, -10_000_000), (2, 10, -30_000_000), (3, 0, 0)],
        ["doc_id", "n_lm_tokens", "sum_logp_micro"],
    )
    # avg micro: doc1 = -1e6, doc2 = -3e6, doc3 no evidence
    out = S.perplexity_buckets(
        scored, thresholds=(-1_500_000.0, -2_500_000.0)
    )
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert got == {1: "head", 2: "tail", 3: "tail"}
    assert "Exchange" not in _plan(out)  # map-only at scale


def test_perplexity_buckets_threshold_validation(spark):
    scored = spark.createDataFrame(
        [(1, 1, 0)], ["doc_id", "n_lm_tokens", "sum_logp_micro"]
    )
    with pytest.raises(ValueError, match="head_min"):
        S.perplexity_buckets(scored, thresholds=(-2.0, -1.0))


# --- gumbel / dsir ----------------------------------------------------------


def test_gumbel_micro_matches_sql(docs, duck):
    out = docs.select(
        "doc_id", S.gumbel_micro("doc_id", seed=7).alias("g")
    )
    sql = (
        f"SELECT doc_id, {S.gumbel_micro_sql('doc_id', seed=7)} AS g "
        "FROM documents"
    )
    assert_matches_oracle(out, duck, sql)


DSIR_MODELS_CTE = f"""
tok AS (
  SELECT doc_id, unnest({TOK}) AS token FROM documents),
tref AS (
  SELECT token, count(*) AS c FROM tok
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
  GROUP BY token),
ttot AS (SELECT sum(c) AS total, count(*) AS v FROM tref),
tmodel AS (
  SELECT token,
         CAST(round(ln((c + 1.0) / (total + v + 1)) * 1000000) AS BIGINT)
           AS lp
  FROM tref, ttot),
tunk AS (
  SELECT CAST(round(ln(1.0 / (total + v + 1)) * 1000000) AS BIGINT) AS u
  FROM ttot),
rref AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
rtot AS (SELECT sum(c) AS total, count(*) AS v FROM rref),
rmodel AS (
  SELECT token,
         CAST(round(ln((c + 1.0) / (total + v + 1)) * 1000000) AS BIGINT)
           AS lp
  FROM rref, rtot),
runk AS (
  SELECT CAST(round(ln(1.0 / (total + v + 1)) * 1000000) AS BIGINT) AS u
  FROM rtot),
per AS (
  SELECT t.doc_id, count(*) AS n_lm_tokens,
         CAST(sum(coalesce(tm.lp, tunk.u) - coalesce(rm.lp, runk.u))
              AS BIGINT) AS logw_micro
  FROM tok t
  LEFT JOIN tmodel tm USING (token)
  LEFT JOIN rmodel rm USING (token), tunk, runk
  GROUP BY t.doc_id),
weights AS (
  SELECT d.doc_id,
         CAST(coalesce(per.n_lm_tokens, 0) AS BIGINT) AS n_lm_tokens,
         per.logw_micro
  FROM documents d LEFT JOIN per USING (doc_id))
"""


def _dsir_models(docs):
    target, t_unk = L.train_unigram_lm(docs.filter(F.col("lang") == "en"))
    raw, r_unk = L.train_unigram_lm(docs)
    return target, t_unk, raw, r_unk


def test_dsir_weights_oracle(docs, duck):
    target, t_unk, raw, r_unk = _dsir_models(docs)
    out = S.dsir_weights(docs, target, t_unk, raw, r_unk)
    sql = "WITH " + DSIR_MODELS_CTE + "SELECT * FROM weights"
    assert_matches_oracle(out, duck, sql)


def test_dsir_select_full_oracle(docs, duck):
    target, t_unk, raw, r_unk = _dsir_models(docs)
    out = S.dsir_select(docs, target, t_unk, raw, r_unk, k=40, seed=11)
    g = S.gumbel_micro_sql("doc_id", seed=11)
    sql = (
        "WITH " + DSIR_MODELS_CTE
        + f"""
SELECT doc_id, n_lm_tokens, logw_micro,
       logw_micro + {g} AS key_micro
FROM weights WHERE n_lm_tokens > 0
ORDER BY key_micro DESC, doc_id LIMIT 40
"""
    )
    assert_matches_oracle(out, duck, sql)


def test_dsir_select_prefers_target_like(spark):
    # long docs so |logw| >> the bounded Gumbel noise (G_micro spans
    # roughly [-3e6, 2.2e7] for a 31-bit u): selection must be exactly
    # the target-like half when k matches it
    target_text = "spark sql shuffle join " * 40
    junk_text = "zzz qqq xxx www " * 40
    ref = spark.createDataFrame(
        [(i, target_text) for i in range(5)], ["doc_id", "text"]
    )
    raw_corpus = spark.createDataFrame(
        [(i, target_text if i % 2 == 0 else junk_text) for i in range(20)],
        ["doc_id", "text"],
    )
    target, t_unk = L.train_unigram_lm(ref)
    raw, r_unk = L.train_unigram_lm(raw_corpus)
    out = S.dsir_select(
        raw_corpus, target, t_unk, raw, r_unk, k=10, seed=3
    )
    picked = sorted(r["doc_id"] for r in out.collect())
    assert picked == [i for i in range(20) if i % 2 == 0]


def test_dsir_select_partitioning_invariant(docs):
    target, t_unk, raw, r_unk = _dsir_models(docs)
    a = S.dsir_select(docs, target, t_unk, raw, r_unk, k=25, seed=5)
    b = S.dsir_select(
        docs.repartition(7), target, t_unk, raw, r_unk, k=25, seed=5
    )
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_dsir_select_topk_plan(docs):
    target, t_unk, raw, r_unk = _dsir_models(docs)
    out = S.dsir_select(docs, target, t_unk, raw, r_unk, k=10)
    assert "TakeOrderedAndProject" in _plan(out)  # heap top-k, no sort


def test_dsir_select_validation(docs):
    target, t_unk, raw, r_unk = _dsir_models(docs)
    with pytest.raises(ValueError, match="k must be positive"):
        S.dsir_select(docs, target, t_unk, raw, r_unk, k=0)


# --- pipeline knob ----------------------------------------------------------


def test_pipeline_domain_cap_knob(spark):
    from sparkall_spark.operators.pipeline import prepare_documents

    base = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    rows = [
        # domain a: three EQUAL-quality 9-token docs (distinct suffix
        # word keeps the exact-dedup fingerprint apart) -> quality ties
        # break by id, so the greedy prefix under an 18-token budget is
        # exactly ids {1, 2}. domain b: one doc, fits.
        (1, base + " one", "a"),
        (2, base + " two", "a"),
        (3, base + " six", "a"),
        (4, base + " ten", "b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "host"])
    out = prepare_documents(
        df, min_quality=0.0,
        domain_cap_col="host", domain_token_budget=20,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1, 2, 4}
    assert "__ntok" not in out.columns and "quality" in out.columns


# --- property contracts -----------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_doc_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),      # doc id (dedup below)
        st.sampled_from(["a", "b", "c"]),            # stratum
        st.integers(min_value=0, max_value=40),      # n tokens
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_doc_st, budget=st.integers(min_value=1, max_value=120))
def test_stratum_token_cap_properties(spark, rows, budget):
    """Invariants for any corpus: (1) each stratum's kept total fits the
    budget; (2) a larger budget keeps a superset (greedy prefix grows
    monotonically); (3) membership survives repartitioning."""
    uniq = {r[0]: r for r in rows}
    data = [uniq[k] for k in sorted(uniq)]
    if not data:
        return
    df = spark.createDataFrame(data, ["doc_id", "st", "n"])
    kept = S.stratum_token_cap(
        df, "st", "n", token_budget=budget, id_col="doc_id", order_col="n"
    )
    rows_kept = kept.groupBy("st").agg(F.sum("n").alias("t")).collect()
    assert all(r["t"] <= budget for r in rows_kept)
    small = {
        r["doc_id"]
        for r in kept.select("doc_id").collect()
    }
    bigger = {
        r["doc_id"]
        for r in S.stratum_token_cap(
            df, "st", "n", token_budget=budget + 37, id_col="doc_id",
            order_col="n",
        ).select("doc_id").collect()
    }
    assert small <= bigger
    reparted = {
        r["doc_id"]
        for r in S.stratum_token_cap(
            df.repartition(5), "st", "n", token_budget=budget,
            id_col="doc_id", order_col="n",
        ).select("doc_id").collect()
    }
    assert reparted == small


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    scores=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=80),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=-9_000_000_000, max_value=0),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_perplexity_buckets_properties(spark, scores):
    """Rank-tercile invariants: every input row lands in exactly one
    bucket; non-empty-doc bucket sizes differ by at most one; zero-token
    docs always grade tail."""
    uniq = {r[0]: r for r in scores}
    data = [uniq[k] for k in sorted(uniq)]
    if not data:
        return
    df = spark.createDataFrame(
        data, ["doc_id", "n_lm_tokens", "sum_logp_micro"]
    )
    out = S.perplexity_buckets(df).collect()
    assert len(out) == len(data)
    got = {r["doc_id"]: r["bucket"] for r in out}
    empties = {i for i, n, _ in data if n == 0}
    assert all(got[i] == "tail" for i in empties)
    from collections import Counter

    ranked = Counter(
        r["bucket"] for r in out if r["doc_id"] not in empties
    )
    if ranked:
        lo, hi = min(ranked.values()), max(ranked.values())
        assert hi - lo <= 1 or len(ranked) < 3


def test_numeric_id_required_for_hash_paths(spark):
    """String ids (e.g. crawl hex doc_ids) would break the portable
    LCG hash under ANSI mode — both hash-dependent paths fail loudly
    with the xxhash64 remedy in the message."""
    df = spark.createDataFrame(
        [("abc", "s", 1, "t")], ["doc_id", "st", "n", "text"]
    )
    with pytest.raises(ValueError, match="xxhash64"):
        S.stratum_token_cap(df, "st", "n", token_budget=5, id_col="doc_id")
    # an explicit order_col never touches the hash: string ids are fine
    assert (
        S.stratum_token_cap(
            df, "st", "n", token_budget=5, id_col="doc_id", order_col="n"
        ).count()
        == 1
    )
    model = spark.createDataFrame([("t", -1000)], ["token", "logp_micro"])
    with pytest.raises(ValueError, match="xxhash64"):
        S.dsir_select(df, model, -2000, model, -2000, k=1)


def test_stratum_token_cap_null_order_sorts_last(spark, duck):
    """Nullable order column: NULL rows must claim the budget LAST in
    both engines (Spark bare asc() would put them first)."""
    df = spark.createDataFrame(
        [(1, "s", 3, None), (2, "s", 3, 5), (3, "s", 3, 1)],
        ["doc_id", "st", "n", "score"],
    )
    asc = S.stratum_token_cap(
        df, "st", "n", token_budget=6, id_col="doc_id",
        order_col="score", descending=False,
    )
    assert sorted(r["doc_id"] for r in asc.collect()) == [2, 3]
    desc = S.stratum_token_cap(
        df, "st", "n", token_budget=6, id_col="doc_id",
        order_col="score", descending=True,
    )
    assert sorted(r["doc_id"] for r in desc.collect()) == [2, 3]


def test_dsir_threshold_equals_topk_at_kth_key(docs):
    """With the cutoff set to the k-th selected key, the map-only
    threshold form reproduces the exact top-k set."""
    target, t_unk, raw, r_unk = _dsir_models(docs)
    topk = S.dsir_select(docs, target, t_unk, raw, r_unk, k=30, seed=9)
    rows = topk.collect()
    kth = min(r["key_micro"] for r in rows)
    thr = S.dsir_select_threshold(
        docs, target, t_unk, raw, r_unk, key_min_micro=kth, seed=9
    )
    assert sorted(r["doc_id"] for r in thr.collect()) == sorted(
        r["doc_id"] for r in rows
    )
    # the decision itself is a plain filter on the BIGINT key — no
    # ranking operator over the corpus (the only Sort in the plan is
    # the vocab-scale model full-outer join)
    plan = _plan(thr.select("doc_id", "key_micro"))
    assert "key_micro" in plan and "Filter" in plan


def test_bucket_thresholds_calibrate_map_only_form(docs):
    """Thresholds calibrated on the full scored table make the map-only
    form agree with the exact rank terciles up to quantile-boundary
    docs (ties at the interpolated cutoffs)."""
    scored = _lm_scored(docs)
    head_min, middle_min = S.bucket_thresholds(scored)
    assert head_min >= middle_min
    by_rank = {
        r["doc_id"]: r["bucket"]
        for r in S.perplexity_buckets(scored).collect()
    }
    by_thr = {
        r["doc_id"]: r["bucket"]
        for r in S.perplexity_buckets(
            scored, thresholds=(head_min, middle_min)
        ).collect()
    }
    assert set(by_rank) == set(by_thr)
    disagree = sum(1 for k in by_rank if by_rank[k] != by_thr[k])
    assert disagree <= max(2, len(by_rank) // 100)
    # empty sample fails loudly
    with pytest.raises(ValueError, match="empty sample"):
        S.bucket_thresholds(scored.filter("doc_id < 0"))


# --- hashed n-gram DSIR (r7, Xie et al. 2023 feature space) ----------------

HB = 10_000


def _hashed_models_cte() -> str:
    hng = S.hashed_ngram_list_sql("t", HB, 2)
    return f"""
hfeat AS (
  SELECT doc_id, unnest({hng}) AS bucket
  FROM (SELECT doc_id, {TOK} AS t FROM documents)),
htgt AS (
  SELECT bucket, count(*) AS c FROM hfeat
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
  GROUP BY bucket),
httot AS (SELECT coalesce(sum(c), 0) AS total FROM htgt),
htmodel AS (
  SELECT bucket,
         CAST(round(ln((c + 1.0) / (total + {HB})) * 1000000) AS BIGINT)
           AS lp
  FROM htgt, httot),
htunk AS (
  SELECT CAST(round(ln(1.0 / (total + {HB})) * 1000000) AS BIGINT) AS u
  FROM httot),
hraw AS (SELECT bucket, count(*) AS c FROM hfeat GROUP BY bucket),
hrtot AS (SELECT coalesce(sum(c), 0) AS total FROM hraw),
hrmodel AS (
  SELECT bucket,
         CAST(round(ln((c + 1.0) / (total + {HB})) * 1000000) AS BIGINT)
           AS lp
  FROM hraw, hrtot),
hrunk AS (
  SELECT CAST(round(ln(1.0 / (total + {HB})) * 1000000) AS BIGINT) AS u
  FROM hrtot),
hper AS (
  SELECT f.doc_id, count(*) AS n_lm_tokens,
         CAST(sum(coalesce(tm.lp, htunk.u) - coalesce(rm.lp, hrunk.u))
              AS BIGINT) AS logw_micro
  FROM hfeat f
  LEFT JOIN htmodel tm USING (bucket)
  LEFT JOIN hrmodel rm USING (bucket), htunk, hrunk
  GROUP BY f.doc_id),
hweights AS (
  SELECT d.doc_id,
         CAST(coalesce(hper.n_lm_tokens, 0) AS BIGINT) AS n_lm_tokens,
         hper.logw_micro
  FROM documents d LEFT JOIN hper USING (doc_id))
"""


def _hashed_models(docs):
    target, t_unk = S.train_hashed_ngram_model(
        docs.filter(F.col("lang") == "en"), n_buckets=HB, max_n=2
    )
    raw, r_unk = S.train_hashed_ngram_model(docs, n_buckets=HB, max_n=2)
    return target, t_unk, raw, r_unk


def test_hashed_ngram_ids_matches_sql(docs, duck):
    out = docs.select(
        "doc_id", S.hashed_ngram_ids("text", HB, 2).alias("ids")
    )
    sql = f"SELECT doc_id, {S.hashed_ngram_ids_sql('text', HB, 2)} AS ids FROM documents"
    assert_matches_oracle(out, duck, sql)


def test_hashed_ngram_ids_counts_occurrences(spark):
    """Occurrences, not distinct grams: 'a a a' has 3 unigram + 2
    bigram features, and both bigrams hash identically."""
    df = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    ids = df.select(S.hashed_ngram_ids("text", HB, 2).alias("x")).first()["x"]
    assert len(ids) == 5
    assert len(set(ids[:3])) == 1 and len(set(ids[3:])) == 1
    only_uni = df.select(
        S.hashed_ngram_ids("text", HB, 1).alias("x")
    ).first()["x"]
    assert len(only_uni) == 3
    with pytest.raises(ValueError, match="max_n"):
        S.hashed_ngram_ids("text", HB, 0)


def test_hashed_model_oracle(docs, duck):
    raw, r_unk = S.train_hashed_ngram_model(docs, n_buckets=HB, max_n=2)
    sql = (
        "WITH " + _hashed_models_cte()
        + "SELECT bucket, lp AS logp_micro FROM hrmodel"
    )
    assert_matches_oracle(
        raw.select("bucket", "logp_micro"), duck, sql
    )
    # unk mirrors the closed-domain denominator
    exp_unk = duck.execute(
        "WITH " + _hashed_models_cte() + "SELECT u FROM hrunk"
    ).fetchone()[0]
    assert r_unk == exp_unk


def test_dsir_weights_hashed_oracle(docs, duck):
    target, t_unk, raw, r_unk = _hashed_models(docs)
    out = S.dsir_weights_hashed(
        docs, target, t_unk, raw, r_unk, n_buckets=HB, max_n=2
    )
    sql = "WITH " + _hashed_models_cte() + "SELECT * FROM hweights"
    assert_matches_oracle(out, duck, sql)


def test_dsir_select_hashed_oracle(docs, duck):
    target, t_unk, raw, r_unk = _hashed_models(docs)
    out = S.dsir_select_hashed(
        docs, target, t_unk, raw, r_unk, k=40, n_buckets=HB, max_n=2,
        seed=13,
    )
    g = S.gumbel_micro_sql("doc_id", seed=13)
    sql = (
        "WITH " + _hashed_models_cte()
        + f"""
SELECT doc_id, n_lm_tokens, logw_micro,
       logw_micro + {g} AS key_micro
FROM hweights WHERE n_lm_tokens > 0
ORDER BY key_micro DESC, doc_id LIMIT 40
"""
    )
    assert_matches_oracle(out, duck, sql)


def test_dsir_hashed_prefers_target_like(spark):
    """Bigram features separate word-ORDER domains that unigram DSIR
    cannot: every document uses the same unigrams, only the target
    half shares the target's bigrams."""
    target_text = "alpha beta gamma delta " * 30
    shuffled = "beta alpha delta gamma " * 30  # same unigrams, new bigrams
    ref = spark.createDataFrame(
        [(i, target_text) for i in range(5)], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(i, target_text if i % 2 == 0 else shuffled) for i in range(20)],
        ["doc_id", "text"],
    )
    target, t_unk = S.train_hashed_ngram_model(ref, n_buckets=HB, max_n=2)
    raw, r_unk = S.train_hashed_ngram_model(corpus, n_buckets=HB, max_n=2)
    out = S.dsir_select_hashed(
        corpus, target, t_unk, raw, r_unk, k=10, n_buckets=HB, max_n=2,
        seed=3,
    )
    picked = sorted(r["doc_id"] for r in out.collect())
    assert picked == [i for i in range(20) if i % 2 == 0]
    # the unigram models are blind to this corpus by construction
    ut, ut_unk = L.train_unigram_lm(ref)
    ur, ur_unk = L.train_unigram_lm(corpus)
    uw = S.dsir_weights(corpus, ut, ut_unk, ur, ur_unk, keep_empty=False)
    assert uw.select("logw_micro").distinct().count() == 1


def test_dsir_hashed_model_broadcasts(docs):
    target, t_unk, raw, r_unk = _hashed_models(docs)
    out = S.dsir_weights_hashed(
        docs, target, t_unk, raw, r_unk, n_buckets=HB, max_n=2
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan  # fixed-size dictionary lookup
    assert "TakeOrderedAndProject" in _plan(
        S.dsir_select_hashed(docs, target, t_unk, raw, r_unk, k=5)
    )


def test_temperature_mix_weights_matches_sql_and_limits(spark, duck, sf_dir):
    """Micro-exact mirror equality on the real fixture, plus the two
    analytic limits: alpha=1 is proportional sampling, alpha=0 the
    uniform mix; alpha=0.3 upsamples every below-average group."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for alpha in (0.3, 1.0, 0.0):
        got = {
            r["lang"]: (r["n_docs"], r["weight_micro"], r["boost_micro"])
            for r in S.temperature_mix_weights(
                docs, "lang", alpha=alpha
            ).collect()
        }
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in duck.execute(
                S.temperature_mix_sql("documents", "lang", alpha=alpha)
            ).fetchall()
        }
        assert got == want, alpha
    n_groups = len(got)
    total = sum(v[0] for v in got.values())
    # alpha=0 (the last loop iteration): uniform weights, boost = 1/p
    for lang, (n, w, b) in got.items():
        assert abs(w - round(1_000_000 / n_groups)) <= 1
        assert abs(b - round(1_000_000 * total / (n_groups * n))) <= 2
    # alpha=1: proportional — weight == share, boost == 1x
    prop = {
        r["lang"]: (r["n_docs"], r["weight_micro"], r["boost_micro"])
        for r in S.temperature_mix_weights(docs, "lang", alpha=1.0).collect()
    }
    for lang, (n, w, b) in prop.items():
        assert abs(w - round(1_000_000 * n / total)) <= 1
        assert abs(b - 1_000_000) <= 2
    # alpha=0.3: every minority group (share < 1/n_groups) gets boost > 1
    t03 = {
        r["lang"]: (r["n_docs"], r["boost_micro"])
        for r in S.temperature_mix_weights(docs, "lang", alpha=0.3).collect()
    }
    assert any(b > 1_000_000 for _n, b in t03.values())
    for lang, (n, b) in t03.items():
        if n / total < 1 / n_groups:
            assert b > 1_000_000, (lang, n, b)


def test_temperature_mix_drops_null_groups(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de"), (4, None)],
        "doc_id long, lang string",
    )
    out = S.temperature_mix_weights(df, "lang", alpha=0.5)
    rows = {r["lang"]: r["n_docs"] for r in out.collect()}
    assert rows == {"en": 2, "de": 1}


def test_temperature_mix_plan_has_no_window(spark, sf_dir):
    """The normalizers ride broadcast one-row frames, not a
    whole-frame window (no single-partition WindowExec)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = S.temperature_mix_weights(docs, "lang", alpha=0.3)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row normalizer frames


def test_apply_mix_weights_epochs_and_mirror(spark, duck, sf_dir):
    """The sampler closes the mix loop: per-group expected copies equal
    boost_micro/1e6 exactly (integer arithmetic over the portable
    hash), epochs are 0-based and dense, and the whole decision
    mirrors in SQL."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    w = S.temperature_mix_weights(docs, "lang", alpha=0.3)
    out = S.apply_mix_weights(docs, w, "lang", seed=5)
    rows = out.collect()
    got = {(r["doc_id"], r["epoch"]) for r in rows}
    # deterministic across reruns
    assert got == {
        (r["doc_id"], r["epoch"])
        for r in S.apply_mix_weights(docs, w, "lang", seed=5).collect()
    }
    # mirror: same k(id) arithmetic over the SQL-side weights
    mix = S.mix_sql("doc_id", 5)
    mirror = duck.execute(f"""
        WITH w AS ({S.temperature_mix_sql('documents', 'lang', alpha=0.3)})
        SELECT d.doc_id,
               (w.boost_micro // 1000000)
               + CASE WHEN ({mix}) % 1000000 < w.boost_micro % 1000000
                      THEN 1 ELSE 0 END AS k
        FROM documents d JOIN w ON w.grp = d.lang
    """).fetchall()
    want = set()
    for doc_id, k in mirror:
        for e in range(int(k)):
            want.add((doc_id, e))
    assert got == want
    # per-group realized copies are within 1 per row of the exact
    # expectation (the fractional part is a hash Bernoulli)
    import collections
    lang_of = {r["doc_id"]: r["lang"] for r in docs.collect()}
    n_in = collections.Counter(lang_of.values())
    n_out = collections.Counter(lang_of[d] for d, _e in got)
    boost = {r["lang"]: r["boost_micro"] / 1e6 for r in w.collect()}
    for lang, n in n_in.items():
        assert abs(n_out[lang] - boost[lang] * n) <= n
    # upsampled groups really gained epochs beyond 0
    assert any(e > 0 for _d, e in got)


def test_apply_mix_weights_requires_integer_id(spark):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [("a", "en")], "doc_id string, lang string"
    )
    w = spark.createDataFrame([("en", 1_500_000)],
                              "lang string, boost_micro bigint")
    with _pytest.raises(ValueError, match="integer id"):
        S.apply_mix_weights(docs, w, "lang")
