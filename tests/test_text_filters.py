"""Published-filter predicates: Gopher quality keep (Rae et al. 2021,
Table A1) and C4 line/document rules (Raffel et al. 2020, §2.2) — unit
semantics plus cross-engine mirrors of the SQL builders."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

from sparkall_spark.functions import text as X


def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


CASES = [
    # (text, c4 kept-line count with the default rules)
    ("Good line with punctuation.\nshort.\nno terminal punct", 1),
    ("Uses javascript for menus.\nReal content sentence here.", 1),
    ('He said "stop right there!"\nAnother good line?', 2),
    ("", 0),
    ("one two three", 0),  # no terminal punctuation
]


def test_c4_kept_lines_rules(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], ["id", "t"]
    ).select("id", F.size(X.c4_kept_lines("t")).alias("n"))
    got = {r["id"]: r["n"] for r in df.collect()}
    assert got == {i: n for i, (_, n) in enumerate(CASES)}


def test_c4_keep_banned_and_sentences(spark):
    rows = [
        (1, "A fine sentence here. Another one follows! A third?"),
        (2, "Lorem Ipsum dolor sit amet. More words in this line."),
        (3, "Contains a { brace in otherwise fine text. More here."),
        (4, "Too few sentences for the default."),
    ]
    df = spark.createDataFrame(rows, ["id", "t"]).select(
        "id", X.c4_keep("t", min_sentences=3).alias("keep")
    )
    got = {r["id"]: r["keep"] for r in df.collect()}
    # 1: three sentences on one kept line; 2/3: banned substrings;
    # 4: only one sentence
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_gopher_quality_keep_clauses(spark):
    long_good = (
        "the quick brown fox jumps over that lazy dog and then have "
        "some more words with good length " * 3
    )
    rows = [
        (1, long_good),  # passes (>=50 words via repetition, stopwords present)
        (2, "short text"),  # word count too low
        (3, ("x " * 60).strip()),  # mean word length 1 < 3, no stop words
    ]
    df = spark.createDataFrame(rows, ["id", "t"]).select(
        "id", X.gopher_quality_keep("t").alias("keep")
    )
    got = {r["id"]: r["keep"] for r in df.collect()}
    assert got == {1: True, 2: False, 3: False}


def test_gopher_symbol_caps_are_per_symbol(spark):
    """Gopher Table A1 caps the hash ratio and the ellipsis ratio at
    0.1 EACH — a document whose two ratios are ~0.07 apiece (combined
    ~0.14) must KEEP, while crossing either single cap must drop
    (ADVICE r6: the old combined cap was stricter than the paper)."""
    filler = (
        "the quick brown fox jumps over that lazy dog and then have "
        "some more words with good length " * 3
    )  # 51 words, passes every other clause
    both_under = filler + "# # # # ... ... ... ... end"  # ~4/63 each, sum ~0.13
    hash_over = filler + "# " * 8               # hash ratio ~8/59 > 0.1
    ell_over = filler + "... " * 8              # ellipsis ratio > 0.1
    rows = [(1, both_under), (2, hash_over), (3, ell_over)]
    df = spark.createDataFrame(rows, ["id", "t"]).select(
        "id",
        X.gopher_quality_keep("t").alias("keep"),
        F.round(X.hash_word_ratio("t"), 6).alias("hr"),
        F.round(X.ellipsis_word_ratio("t"), 6).alias("er"),
    )
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["hr"] + got[1]["er"] > 0.1  # combined cap WOULD drop it
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["hr"] > 0.1
    assert got[3]["keep"] is False and got[3]["er"] > 0.1


def test_filter_sql_mirrors(spark, duck, sf_dir):
    """The SQL builders reproduce the Column semantics bit-for-bit on a
    planted multi-line corpus variant (fixture docs are single-line)."""
    src = F.concat(
        F.col("text"), F.lit("\n"), F.trim(F.substring("text", 1, 12)),
        F.lit("."),
    )
    df = docs(spark, sf_dir).select(
        "doc_id",
        F.size(X.c4_kept_lines(src)).alias("n_kept"),
        F.length(X.c4_clean_lines(src)).cast("bigint").alias("n_clean"),
        X.gopher_stop_hits("text").cast("bigint").alias("stop_hits"),
    )
    s = "text || chr(10) || trim(substr(text, 1, 12)) || '.'"
    assert_matches_oracle(
        df,
        duck,
        f"""
        SELECT doc_id,
               len({X.c4_kept_lines_sql(s)}) AS n_kept,
               len({X.c4_clean_lines_sql(s)})::BIGINT AS n_clean,
               {X.gopher_stop_hits_sql('text')}::BIGINT AS stop_hits
        FROM documents
        """,
    )


def test_gopher_quality_keep_paper_defaults_discriminate(spark, sf_dir):
    """With the published Table A1 thresholds the fixture splits into
    keeps and rejects (word counts span 10..99 around the 50-word
    floor), and every kept doc satisfies the word-count clause — pins
    that defaults are the paper's, not fixture-tuned ones."""
    d = docs(spark, sf_dir).select(
        X.gopher_quality_keep("text").alias("keep"),
        X.token_count("text").alias("n"),
    )
    total = d.count()
    kept = d.filter("keep").count()
    assert 0 < kept < total
    assert d.filter(F.col("keep") & (F.col("n") < 50)).count() == 0


def test_dedup_lines_keeps_first_occurrence(spark):
    from sparkall_spark.functions.text import dedup_lines

    rows = [
        (1, "a line\nb line\na line\nc line\nb line"),
        (2, "only one line"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "t"]).select(
        "id", dedup_lines("t").alias("out")
    )
    got = {r["id"]: r["out"] for r in df.collect()}
    assert got == {1: "a line\nb line\nc line", 2: "only one line", 3: ""}
