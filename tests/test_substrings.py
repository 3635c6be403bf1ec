"""Exact-substring span dedup (operators/substrings.py) vs DuckDB
oracles and hand-built fixtures.

The oracle mirrors the operator relationally on CONTENT (grams are the
literal k-token strings — no hashes), so it is collision-free by
construction; the engine's xxhash64 window key must agree with it
exactly on every fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.substrings import (
    duplicated_span_stats,
    exact_substring_dedup,
)
from tests.conftest import assert_matches_oracle


def _oracle(corpus_cte: str, k: int) -> str:
    """clean_text + n_removed_tokens per doc for a corpus CTE named
    ``corpus(doc_id, text)`` — pure-relational ExactSubstr mirror."""
    return f"""
WITH {corpus_cte},
tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
  FROM corpus),
pos AS (
  SELECT doc_id, unnest(range(1, greatest(len(tk) - {k} + 2, 1))) AS i, tk
  FROM tk),
wins AS (
  SELECT doc_id, i, array_to_string(tk[i:i+{k}-1], ' ') AS gram FROM pos),
ranked AS (
  SELECT doc_id, i,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
  FROM wins),
dup AS (SELECT doc_id, i FROM ranked WHERE rn > 1),
cov AS (
  SELECT DISTINCT doc_id, i + u AS j
  FROM (SELECT doc_id, i, unnest(range(0, {k})) AS u FROM dup) q),
tokpos AS (
  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS j, tk FROM tk),
kept AS (
  SELECT t.doc_id, t.j, t.tk[t.j] AS tok
  FROM tokpos t
  WHERE NOT EXISTS (SELECT 1 FROM cov c
                    WHERE c.doc_id = t.doc_id AND c.j = t.j)),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id),
ntok AS (SELECT doc_id, len(tk) AS n FROM tk)
SELECT c.doc_id, coalesce(r.clean_text, '') AS clean_text,
       CAST(n.n - coalesce(r.n_kept, 0) AS INT) AS n_removed_tokens
FROM corpus c JOIN ntok n USING (doc_id) LEFT JOIN rebuilt r USING (doc_id)
"""


# fixture-derived corpus with REAL duplication: every document gets a
# second copy whose head is new but whose body repeats the original, so
# interior windows duplicate across the pair
_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 1000000, 'copyhead ' || text
  FROM documents WHERE doc_id % 7 = 0)
"""


def _spark_corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "text")
    )
    copies = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("copyhead "), F.col("text")).alias("text"),
    )
    return docs.unionByName(copies)


def test_fixture_corpus_matches_oracle(spark, duck, sf_dir):
    corpus = _spark_corpus(spark, sf_dir)
    out = exact_substring_dedup(corpus, k=8).select(
        "doc_id", "clean_text", "n_removed_tokens"
    )
    assert_matches_oracle(out, duck, _oracle(_CORPUS_CTE, 8))
    # the duplication is real: copies lost tokens, and at least one did
    removed = (
        out.filter(F.col("doc_id") >= 1000000)
        .agg(F.sum("n_removed_tokens"))
        .collect()[0][0]
    )
    assert removed and removed > 0


def test_planted_cross_doc_passage(spark):
    passage = " ".join(f"p{i}" for i in range(60))
    a = "alpha start " + passage + " alpha end"
    b = "beta has other words then " + passage + " and a beta tail"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in exact_substring_dedup(df, k=50).collect()
    }
    # first occurrence (doc 1) intact; doc 2 loses exactly the passage
    assert out[1]["clean_text"] == a
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["clean_text"] == "beta has other words then and a beta tail"
    assert out[2]["n_removed_tokens"] == 60


def test_periodic_text_collapses_to_first_period(spark):
    period = [f"w{i}" for i in range(8)]
    text = " ".join(period * 10)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = exact_substring_dedup(df, k=8).collect()[0]
    assert row["clean_text"] == " ".join(period)
    assert row["n_removed_tokens"] == 72


def test_short_docs_whitespace_normalized_only(spark):
    df = spark.createDataFrame(
        [(1, "  a   b \t c  "), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in exact_substring_dedup(df, k=50).collect()}
    assert rows[1]["clean_text"] == "a b c"
    assert rows[1]["n_removed_tokens"] == 0
    assert rows[2]["clean_text"] == ""
    assert rows[2]["n_removed_tokens"] == 0


def test_rewrite_mode_and_validation(spark, sf_dir):
    corpus = _spark_corpus(spark, sf_dir).limit(20)
    out = exact_substring_dedup(corpus, k=8, mode="rewrite")
    assert set(out.columns) == {"doc_id", "text"}
    with pytest.raises(ValueError):
        exact_substring_dedup(corpus, mode="bogus")
    with pytest.raises(ValueError):
        exact_substring_dedup(corpus, k=1)


def test_partitioning_invariance(spark, sf_dir):
    corpus = _spark_corpus(spark, sf_dir)
    a = exact_substring_dedup(corpus, k=8).orderBy("doc_id").collect()
    b = (
        exact_substring_dedup(corpus.repartition(7), k=8)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_span_stats_consistent(spark, sf_dir):
    corpus = _spark_corpus(spark, sf_dir)
    stats = duplicated_span_stats(corpus, k=8).collect()
    assert stats
    for r in stats:
        assert 0 <= r["n_removed_tokens"] <= r["n_tokens"]
        if r["n_tokens"]:
            assert r["dup_token_frac"] == round(
                r["n_removed_tokens"] / r["n_tokens"], 6
            )


def test_plan_no_udf_no_cartesian(spark, sf_dir):
    corpus = _spark_corpus(spark, sf_dir)
    plan = (
        exact_substring_dedup(corpus, k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _py_exact_substr(docs: dict[int, list[str]], k: int):
    """Naive reference: duplicated k-window detection + span cut."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(docs):
        tk = docs[d]
        for i in range(len(tk) - k + 1):
            occ.setdefault(tuple(tk[i:i + k]), []).append((d, i))
    cut: dict[int, set[int]] = {d: set() for d in docs}
    for places in occ.values():
        for d, i in sorted(places)[1:]:
            cut[d].update(range(i, i + k))
    out = {}
    for d, tk in docs.items():
        kept = [t for j, t in enumerate(tk) if j not in cut[d]]
        out[d] = (" ".join(kept), len(tk) - len(kept))
    return out


def test_hypothesis_matches_python_reference(spark):
    from hypothesis import given, settings, strategies as st

    token = st.sampled_from(["a", "b", "c", "ab"])
    doc = st.lists(token, min_size=0, max_size=14)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5), st.integers(2, 4))
    def check(doclists, k):
        docs = {i: tk for i, tk in enumerate(doclists)}
        df = spark.createDataFrame(
            [(i, " ".join(tk)) for i, tk in docs.items()],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
            for r in exact_substring_dedup(df, k=k).collect()
        }
        assert got == _py_exact_substr(docs, k)

    check()


def test_hot_gram_flood_bounded(spark):
    """SCALE.md claim: a single window content repeated across the whole
    corpus lands in one rank partition and must still complete with the
    exact first-occurrence survivor."""
    passage = " ".join(f"h{i}" for i in range(8))
    rows = [(i, f"u{i}x u{i}y " + passage + f" t{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_substring_dedup(df.repartition(16), k=8)
    kept = {r["doc_id"]: r for r in out.collect()}
    assert kept[0]["n_removed_tokens"] == 0  # first occurrence survives
    assert sum(1 for r in kept.values() if r["n_removed_tokens"] == 8) == 1999
    assert kept[1]["clean_text"] == "u1x u1y t1"
