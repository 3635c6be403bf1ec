import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

from sparkall_spark.functions import text as X


def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_count_matches_oracle(spark, duck, sf_dir):
    df = docs(spark, sf_dir).select(
        "doc_id", X.token_count("text").alias("n_tokens")
    )
    assert_matches_oracle(
        df,
        duck,
        """
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
                 AS n_tokens
        FROM documents
        """,
    )


def test_char_count_matches_n_chars(spark, sf_dir):
    df = docs(spark, sf_dir).select(
        "doc_id", X.char_count("text").alias("n"), "n_chars"
    )
    bad = df.filter(F.col("n") != F.col("n_chars")).count()
    assert bad == 0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "HELLO\tWORLD "), (4, "other")],
        ["id", "t"],
    ).select("id", X.fingerprint("t").alias("fp"))
    rows = {r["id"]: r["fp"] for r in df.collect()}
    assert rows[1] == rows[2] == rows[3]
    assert rows[4] != rows[1]
    assert all(0 <= v < X.FP_MOD for v in rows.values())


def test_lang_id_known_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy"),
            (2, "der Hund ist nicht mit der Katze und das ist gut"),
            (3, "le chat est sur la table et il est content pour un moment"),
            (4, "xyzzy plugh qwerty"),
        ],
        ["id", "t"],
    ).select("id", X.lang_id("t").alias("lang"))
    rows = {r["id"]: r["lang"] for r in df.collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "fr"
    assert rows[4] == "und"


def test_quality_score_bounds_and_ordering(spark):
    good = "the quick brown fox jumps over a lazy dog near the quiet river bank today"
    bad = "!!! ??? ... ;;; ,,,"
    df = spark.createDataFrame([(1, good), (2, bad)], ["id", "t"]).select(
        "id", X.quality_score("t").alias("q")
    )
    rows = {r["id"]: r["q"] for r in df.collect()}
    assert 0.0 <= rows[2] < rows[1] <= 1.0


def test_word_ngrams(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["id", "t"]).select(
        X.word_ngrams("t", 2).alias("g")
    )
    assert sorted(df.collect()[0]["g"]) == ["a b", "b c", "c d"]


def test_char_ngrams(spark):
    df = spark.createDataFrame([(1, "abcd")], ["id", "t"]).select(
        X.char_ngrams("t", 3).alias("g")
    )
    assert sorted(df.collect()[0]["g"]) == ["abc", "bcd"]


def test_word_ngrams_short_docs_yield_empty(spark):
    """Docs with fewer than n tokens must give [], not crash: unguarded
    F.sequence(0, size-n) produces [0, -1] and F.slice(toks, 0, n)
    raises INVALID_PARAMETER_VALUE.START under Spark 4 ANSI mode."""
    df = spark.createDataFrame(
        [(1, "one two"), (2, "single"), (3, ""), (4, "a b c")], ["id", "t"]
    ).select("id", X.word_ngrams("t", 3).alias("g"))
    rows = {r["id"]: sorted(r["g"]) for r in df.collect()}
    assert rows[1] == []
    assert rows[2] == []
    assert rows[3] == []
    assert rows[4] == ["a b c"]


def test_char_ngrams_short_strings_yield_empty(spark):
    """Strings shorter than n must give [], not a truncated whole-string
    shingle (substr(0, ...) aliases substr(1, ...) and inflates Jaccard
    between short documents)."""
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "abc")], ["id", "t"]
    ).select("id", X.char_ngrams("t", 3).alias("g"))
    rows = {r["id"]: sorted(r["g"]) for r in df.collect()}
    assert rows[1] == []
    assert rows[2] == []
    assert rows[3] == ["abc"]


def test_ngram_jaccard_default_survives_short_docs(spark):
    """The default ngram=3 operator path must run on corpora containing
    short documents (ADVICE round-1 medium finding)."""
    from sparkall_spark.operators import dedup as D

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "hi"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    pairs = D.ngram_jaccard_pairs(df, ngram=3, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    sim = D.minhash_dedup_pairs(df, ngram=3, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in sim} == {(1, 2)}


def test_bpe_token_count_segments(spark, duck):
    """GPT-2-style pre-tokenizer segment counts, mirrored in DuckDB on
    the identical RE2-compatible pattern."""
    cases = [
        (1, "hello world"),          # 2 segments
        (2, "it's fine"),            # it / 's / ' fine' -> 3
        (3, "a1b2"),                 # a / 1 / b / 2 -> 4
        (4, "hi, there!"),           # hi / , / ' there' / ! -> 4
        (5, ""),                     # 0
    ]
    df = spark.createDataFrame(cases, ["id", "t"]).select(
        "id", X.bpe_token_count("t").cast("bigint").alias("n")
    )
    got = {r["id"]: r["n"] for r in df.collect()}
    assert got == {1: 2, 2: 3, 3: 4, 4: 4, 5: 0}
    oracle = {
        i: duck.execute(
            "SELECT len(regexp_extract_all(?, "
            "$$'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+$$))",
            [t],
        ).fetchone()[0]
        for i, t in cases
    }
    assert got == oracle


def test_duplicate_line_ratio(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "a\nb\na\n\n b "),   # trimmed lines: a,b,a,b -> 2/4 dup
            (2, "one\ntwo\nthree"),  # all distinct
            (3, ""),
            (4, None),
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: r["r"]
        for r in df.select(
            "id", F.round(X.duplicate_line_ratio("text"), 6).alias("r")
        ).collect()
    }
    assert out[1] == pytest.approx(0.5)
    assert out[2] == 0.0
    assert out[3] == 0.0
    assert out[4] is None or out[4] == 0.0


def test_duplicate_ngram_ratio(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "x y x y x"),  # 4 bigrams, 2 distinct
            (2, "a b c d"),    # all distinct
            (3, "single"),     # < n tokens
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: r["r"]
        for r in df.select(
            "id", F.round(X.duplicate_ngram_ratio("text", 2), 6).alias("r")
        ).collect()
    }
    assert out[1] == pytest.approx(0.5)
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_pipeline_repetition_filters(spark):
    from sparkall_spark.operators.pipeline import prepare_documents

    rows = [
        # clean doc: enough tokens, distinct lines/bigrams
        (1, "the quick brown fox jumps over the lazy dog near a river bank today"),
        # same quality-ish doc but heavily repeated lines
        (2, "spam line alpha beta\n" * 8 + "one more line gamma delta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base = prepare_documents(df, min_quality=0.0)
    assert {r["doc_id"] for r in base.collect()} == {1, 2}
    strict = prepare_documents(df, min_quality=0.0, max_dup_line_ratio=0.5)
    assert {r["doc_id"] for r in strict.collect()} == {1}
    strict2 = prepare_documents(df, min_quality=0.0, max_dup_ngram_ratio=0.5)
    assert {r["doc_id"] for r in strict2.collect()} == {1}


def test_vocabulary_matches_oracle(spark, duck, sf_dir):
    """Corpus vocabulary (r4): token counts + doc frequencies vs a
    DuckDB unnest oracle on the documents fixture."""
    from sparkall_spark.functions.text import vocabulary

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["token"]: (r["count"], r["doc_freq"])
        for r in vocabulary(docs).collect()
    }
    oracle = duck.execute(
        """
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''
            )) AS token
            FROM documents
        )
        SELECT token, count(*) AS c, count(DISTINCT doc_id) AS df
        FROM toks GROUP BY token
        """
    ).fetchall()
    assert {t: (c, d) for t, c, d in oracle} == got
    # top-k path is deterministic and ordered
    top = vocabulary(docs, max_size=5).collect()
    assert len(top) == 5
    assert [r["count"] for r in top] == sorted(
        [r["count"] for r in top], reverse=True
    )


def test_tfidf_top_terms_matches_oracle(spark, duck, sf_dir):
    """Per-doc TF-IDF top-k vs a DuckDB window oracle (r4)."""
    from sparkall_spark.functions.text import tfidf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tfidf_top_terms(docs, k=3)
    got = {
        (r["doc_id"], r["rank"]): (r["token"], r["tf"], r["score"])
        for r in out.collect()
    }
    n_docs = docs.count()
    oracle = duck.execute(
        f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''
            )) AS token FROM documents
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM toks GROUP BY doc_id, token),
        dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
                  GROUP BY token),
        scored AS (
            SELECT tf.doc_id, tf.token, tf.tf,
                   round(tf.tf * (ln(({n_docs} + 1.0) / (df + 1)) + 1), 6)
                       AS score
            FROM tf JOIN dfreq USING (token)
        )
        SELECT doc_id, token, tf, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, token ASC) AS rank
        FROM scored QUALIFY rank <= 3
        """
    ).fetchall()
    want = {(d, r): (t, tf, s) for d, t, tf, s, r in oracle}
    assert set(got) == set(want)
    for key, (tok, tf, score) in want.items():
        gt, gf, gs = got[key]
        assert (gt, gf) == (tok, tf), key
        assert abs(gs - score) < 1e-9, key


def test_mix_corpus_deterministic_budget(spark):
    """Corpus mixing: per-source keep fractions hit the budget split
    and membership is the stable id-hash (reruns identical)."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators.sampling import mix_corpus

    rows = [
        (i, "web" if i < 8000 else ("books" if i < 9000 else "code"), 100)
        for i in range(10000)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = mix_corpus(
        df, "source", "n_tokens",
        weights={"web": 0.5, "books": 0.5},  # 'code' dropped
        token_budget=100_000, id_col="doc_id", seed=3,
    )
    toks = {
        r["source"]: r["t"]
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert set(toks) == {"web", "books"}
    # web: 50k budget over 800k available -> ~6.25% kept; books has
    # only 100k for its 50k share -> ~50% kept; hash sampling is
    # binomial so allow generous tolerance
    assert abs(toks["web"] - 50_000) < 10_000
    assert abs(toks["books"] - 50_000) < 10_000
    again = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert again == sorted(
        r["doc_id"]
        for r in mix_corpus(
            df, "source", "n_tokens", {"web": 0.5, "books": 0.5},
            100_000, "doc_id", 3,
        ).select("doc_id").collect()
    )
    # over-budget share caps at keeping the whole source
    all_books = mix_corpus(
        df, "source", "n_tokens", {"books": 1.0}, 10_000_000, "doc_id"
    )
    assert all_books.count() == 1000


# --- compression-ratio repetitiveness signal (r5) -------------------------

def test_compression_ratio_matches_zlib_exactly(spark, sf_dir):
    import zlib

    from sparkall_spark.functions import text as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    rows = docs.select(
        "doc_id", "text", X.compression_ratio("text").alias("r")
    ).collect()
    for row in rows:
        raw = row["text"].encode("utf-8")
        expect = (
            1.0 if not raw else len(zlib.compress(raw, 6)) / len(raw)
        )
        assert row["r"] == expect  # zlib is deterministic per level


def test_compression_ratio_separates_repetitive_text(spark):
    from sparkall_spark.functions import text as X

    prose = ("the quick brown fox jumps over the lazy dog while seven "
             "wizards brew quince jam for the vexed zebra ") * 3
    loop = "spam " * 120
    df = spark.createDataFrame(
        [(1, prose), (2, loop), (3, "")], "doc_id long, text string"
    )
    r = {x["doc_id"]: x["r"] for x in
         df.select("doc_id", X.compression_ratio("text").alias("r")).collect()}
    assert r[2] < r[1]  # looping text compresses far better
    assert r[2] < 0.2
    assert r[3] == 1.0


def test_pipeline_compression_knob(spark):
    from sparkall_spark.operators.pipeline import prepare_documents

    prose = ("a genuinely varied sentence with many distinct words and "
             "different tokens appearing once each time here now then")
    loop = "buy now " * 60
    df = spark.createDataFrame(
        [(1, prose), (2, loop)], "doc_id long, text string"
    )
    out = prepare_documents(df, min_quality=0.0, min_compression_ratio=0.3)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_gopher_rule_signals(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # 4 non-empty lines: 2 bullets ('- x', '2. y'), 1 ellipsis end
            (1, "- item one\n2. item two\nplain line\nteaser text..."),
            # number/symbol soup: 1 of 4 tokens has a letter; 2 hashes +
            # one '...' run over 4 tokens
            (2, "## 123 4,5 x9 ..."),
            (3, ""),
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: (r["b"], r["e"], r["a"], r["s"])
        for r in df.select(
            "id",
            F.round(X.bullet_line_ratio("text"), 6).alias("b"),
            F.round(X.ellipsis_line_ratio("text"), 6).alias("e"),
            F.round(X.alpha_word_ratio("text"), 6).alias("a"),
            F.round(X.symbol_word_ratio("text"), 6).alias("s"),
        ).collect()
    }
    assert out[1][0] == pytest.approx(0.5)    # 2/4 bullet lines
    assert out[1][1] == pytest.approx(0.25)   # 1/4 ellipsis lines
    assert out[1][2] == pytest.approx(0.8)    # 8 of 10 tokens have a letter ("-", "2." do not)
    assert out[2][2] == pytest.approx(0.2)    # 'x9' of '## 123 4,5 x9 ...'
    assert out[2][3] == pytest.approx(0.6)    # (2 hashes + 1 '...') / 5
    assert out[3] == (0.0, 0.0, 0.0, 0.0)


def test_gopher_rule_signals_duckdb_mirror(spark, duck, sf_dir):
    """The four r5 rule signals agree with literal DuckDB renderings on
    the real documents fixture (engine-portability contract, same as the
    older ratio signals)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(
        "doc_id",
        F.round(X.bullet_line_ratio("text"), 6).alias("b"),
        F.round(X.ellipsis_line_ratio("text"), 6).alias("e"),
        F.round(X.alpha_word_ratio("text"), 6).alias("a"),
        F.round(X.symbol_word_ratio("text"), 6).alias("s"),
    )
    lines = (
        "list_filter(list_transform(regexp_split_to_array(text, '\\r?\\n'),"
        " x -> trim(regexp_replace(x, '\\r+$', ''))), x -> x <> '')"
    )
    toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    sql = f"""
    SELECT doc_id,
      round(CASE WHEN len({lines}) > 0 THEN
        len(list_filter({lines},
            x -> regexp_matches(x, '^(?:[-*•]|\\d{{1,3}}[.)])\\s')))
        / CAST(len({lines}) AS DOUBLE) ELSE 0.0 END, 6) AS b,
      round(CASE WHEN len({lines}) > 0 THEN
        len(list_filter({lines}, x -> regexp_matches(x, '(?:\\.\\.\\.|…)$')))
        / CAST(len({lines}) AS DOUBLE) ELSE 0.0 END, 6) AS e,
      round(CASE WHEN len({toks}) > 0 THEN
        len(list_filter({toks}, x -> regexp_matches(x, '[A-Za-z]')))
        / CAST(len({toks}) AS DOUBLE) ELSE 0.0 END, 6) AS a,
      round(CASE WHEN len({toks}) > 0 THEN
        (length(regexp_replace(text, '[^#…]', '', 'g'))
         + len(regexp_extract_all(text, '(\\.\\.\\.)')))
        / CAST(len({toks}) AS DOUBLE) ELSE 0.0 END, 6) AS s
    FROM documents
    """
    assert_matches_oracle(out, duck, sql)


def test_pipeline_gopher_rule_knobs(spark):
    from sparkall_spark.operators.pipeline import prepare_documents

    rows = [
        (1, "a normal sentence about ordinary things and words"),
        (2, "- one\n- two\n- three\n- four"),          # all bullets
        (3, "read more...\nsee details...\nclick here..."),  # teasers
        (4, "## 0x1f 0x2e 9.81 42 1,000,000 ###"),     # symbol soup
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prepare_documents(
        df, min_quality=0.0,
        max_bullet_ratio=0.5,
        max_ellipsis_ratio=0.5,
        min_alpha_word_ratio=0.5,
        max_symbol_word_ratio=0.1,
    )
    assert {r["doc_id"] for r in out.collect()} == {1}


_FP_SQL = """list_reduce(
  list_prepend(0::BIGINT,
    [ascii(c) FOR c IN
       list_filter(string_split(
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ''),
         x -> x <> '')]),
  (acc, c) -> (acc * 31 + c) % 1000000007)"""

_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


def test_corpus_report_global(spark, duck, sf_dir):
    """corpus_report matches a literal DuckDB aggregate on the fixture
    (all but mean_quality, whose Column formula is pinned separately in
    test_quality_score)."""
    from sparkall_spark.operators.pipeline import corpus_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus_report(docs).drop("mean_quality")
    sql = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(len({_TOKS})), 0) AS BIGINT) AS total_tokens,
           CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT {_FP_SQL}) AS BIGINT) AS n_distinct,
           CAST(coalesce(sum(CASE WHEN len({_TOKS}) = 0 THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_empty,
           round(1.0 - count(DISTINCT {_FP_SQL})
                 / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
    FROM documents
    """
    assert_matches_oracle(out, duck, sql)


def test_corpus_report_per_lang_and_empty(spark):
    from sparkall_spark.operators.pipeline import corpus_report

    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "a b", "en"), (3, "", "de")],
        ["doc_id", "text", "lang"],
    )
    rows = {r["lang"]: r for r in corpus_report(df, lang_col="lang").collect()}
    assert rows["en"]["n_docs"] == 2 and rows["en"]["dup_ratio"] == 0.5
    assert rows["de"]["n_empty"] == 1 and rows["de"]["total_tokens"] == 0
    # empty input: one row of zeros, no crash
    empty = corpus_report(df.filter("doc_id < 0")).collect()
    assert len(empty) == 1 and empty[0]["n_docs"] == 0
    assert empty[0]["dup_ratio"] == 0.0


def test_line_signals_handle_crlf(spark):
    """CRLF documents: trailing \r must not defeat the $-anchored
    ellipsis match or make identical lines look distinct."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "read more...\r\nsee details...\r\n"), (2, "a\r\nb\r\na\r\n")],
        ["id", "text"],
    )
    out = {
        r["id"]: (r["e"], r["d"])
        for r in df.select(
            "id",
            F.round(X.ellipsis_line_ratio("text"), 6).alias("e"),
            F.round(X.duplicate_line_ratio("text"), 6).alias("d"),
        ).collect()
    }
    assert out[1][0] == pytest.approx(1.0)
    assert out[2][1] == pytest.approx(1 / 3)


def test_corpus_report_null_text(spark):
    """NULL text is an empty document, not a silently-dropped
    fingerprint: dup_ratio stays honest and n_empty counts it."""
    from sparkall_spark.operators.pipeline import corpus_report

    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, None)], ["doc_id", "text"]
    )
    row = corpus_report(df).collect()[0]
    # distinct fingerprints: {"a b", ""} -> 2; the two NULLs are dups
    # of each other (both empty), nothing else is
    assert row["n_docs"] == 3 and row["n_distinct"] == 2
    assert row["n_empty"] == 2
    assert row["dup_ratio"] == pytest.approx(round(1 - 2 / 3, 6))


def test_line_signals_strip_interior_trailing_cr(spark, duck):
    """A line like '...\r\r\n' leaves a trailing CR after the \r?\n
    split; Java's $ matches before a final \r while RE2's does not, so
    the CR must be stripped before any anchored match — both engines
    must agree on such input."""
    from pyspark.sql import functions as F

    rows = [(1, "read more...\r\r\nplain"), (2, "a\r\r\na\r\nb")]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: (r["e"], r["d"])
        for r in df.select(
            "id",
            F.round(X.ellipsis_line_ratio("text"), 6).alias("e"),
            F.round(X.duplicate_line_ratio("text"), 6).alias("d"),
        ).collect()
    }
    assert out[1][0] == pytest.approx(0.5)
    assert out[2][1] == pytest.approx(1 / 3)
    duck.execute("CREATE OR REPLACE TABLE crlf(id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO crlf VALUES (?, ?)", rows)
    lines = (
        "list_filter(list_transform(regexp_split_to_array(text, '\\r?\\n'),"
        " x -> trim(regexp_replace(x, '\\r+$', ''))), x -> x <> '')"
    )
    mirror = dict(duck.execute(f"""
        SELECT id, round(len(list_filter({lines},
                 x -> regexp_matches(x, '(?:\\.\\.\\.|…)$')))::DOUBLE
               / len({lines}), 6) AS e
        FROM crlf ORDER BY id
    """).fetchall())
    assert mirror[1] == out[1][0] and mirror[2] == out[2][0]


def test_gopher_char_fraction_signals_handcomputed(spark):
    """r6 Gopher repetition signals against hand-computed values."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # tokens [a,b,a,b,c]; bigrams: 'a b','b a','a b','b c'
            # top bigram 'a b' x2, chars 2 -> 2*2/5 = 0.8
            # dup-bigram coverage: tokens 1..4 covered -> 4/5 = 0.8
            (1, "a b a b c"),
            # lines [x, x, yy]: char frac = (4-3)/4; para split: no blank
            # lines -> one paragraph, no dup
            (2, "x\nx\nyy"),
            # paragraphs [p1 line, p2, p2] (blank line with spaces still
            # separates): dup ratio 1/3, char frac 2/11
            (3, "p1 line\n\np2\n \np2"),
            (4, ""),
            (5, "only four tokens here"),  # < 5 tokens -> dup5 = 0.0
        ],
        ["id", "text"],
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            F.round(X.top_ngram_char_fraction("text", 2), 6).alias("top2"),
            F.round(X.duplicate_ngram_char_fraction("text", 2), 6).alias("dup2"),
            F.round(X.duplicate_ngram_char_fraction("text", 5), 6).alias("dup5"),
            F.round(X.duplicate_line_char_fraction("text"), 6).alias("dlc"),
            F.round(X.duplicate_paragraph_ratio("text"), 6).alias("dpr"),
            F.round(X.duplicate_paragraph_char_fraction("text"), 6).alias("dpc"),
        ).collect()
    }
    assert rows[1]["top2"] == pytest.approx(0.8)
    assert rows[1]["dup2"] == pytest.approx(0.8)
    assert rows[2]["dlc"] == pytest.approx(0.25)
    assert rows[2]["dpr"] == 0.0
    assert rows[3]["dpr"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows[3]["dpc"] == pytest.approx(2 / 11, abs=1e-6)
    assert rows[4]["top2"] == 0.0 and rows[4]["dlc"] == 0.0
    assert rows[5]["dup5"] == 0.0
    # a 4-token doc still has a top-2-gram (count 1)
    assert rows[5]["top2"] > 0.0


def test_gopher_char_fraction_duckdb_mirror(spark, duck, sf_dir):
    """Char-fraction signals agree with their SQL mirrors on the real
    fixture, with planted multi-line/paragraph text for the line/para
    legs (fixture docs are single-line)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ml = F.concat("text", F.expr("repeat(concat('\n', trim(substring(text, 1, 20))), cast(1 + doc_id % 3 as int))"))
    mp = F.concat("text", F.expr("repeat(concat('\n\n', trim(substring(text, 1, 20))), cast(1 + doc_id % 3 as int))"))
    # the `_over` attribute forms, exactly as a corpus run uses them —
    # the inline convenience forms re-evaluate the gram-construction
    # subtree per lambda element (measured CPU-minutes at this scale)
    pre = docs.select(
        "doc_id",
        X.tokens(F.lower(F.col("text"))).alias("lt"),
        X._nonempty_lines(ml).alias("lml"),
        X._nonempty_paragraphs(mp).alias("pmp"),
    ).select(
        "*",
        X.all_word_ngrams(F.col("lt"), 2).alias("g2"),
        X.all_word_ngrams(F.col("lt"), 4).alias("g4"),
        X.all_word_ngrams(F.col("lt"), 5).alias("g5"),
        X.all_word_ngrams(F.col("lt"), 10).alias("g10"),
    )
    out = pre.select(
        "doc_id",
        F.round(
            X.top_ngram_char_fraction_over(F.col("lt"), F.col("g2"), 2), 6
        ).alias("top2"),
        F.round(
            X.top_ngram_char_fraction_over(F.col("lt"), F.col("g4"), 4), 6
        ).alias("top4"),
        F.round(
            X.duplicate_ngram_char_fraction_over(F.col("lt"), F.col("g5"), 5),
            6,
        ).alias("dup5"),
        F.round(
            X.duplicate_ngram_char_fraction_over(
                F.col("lt"), F.col("g10"), 10
            ),
            6,
        ).alias("dup10"),
        F.round(X._dup_char_fraction(F.col("lml")), 6).alias("dlc"),
        F.round(
            F.when(
                F.size("pmp") > 0,
                F.lit(1.0) - F.size(F.array_distinct("pmp")) / F.size("pmp"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dpr"),
        F.round(X._dup_char_fraction(F.col("pmp")), 6).alias("dpc"),
    )
    lt = "lt"
    lines = E._LINES_SQL.format(text="ml")
    paras = E._paragraphs_sql("mp")
    sql = f"""
    WITH base AS (
      SELECT doc_id, {E._lt_sql('text')} AS lt,
             text || repeat(chr(10) || trim(substr(text, 1, 20)),
                            (1 + doc_id % 3)::INT) AS ml,
             text || repeat(chr(10) || chr(10) || trim(substr(text, 1, 20)),
                            (1 + doc_id % 3)::INT) AS mp
      FROM documents),
    g AS (
      SELECT doc_id, lt, ml, mp,
             {E._grams_sql('lt', 2)} AS g2,
             {E._grams_sql('lt', 4)} AS g4,
             {E._grams_sql('lt', 5)} AS g5,
             {E._grams_sql('lt', 10)} AS g10
      FROM base)
    SELECT doc_id,
      round({E._top_ngram_char_fraction_sql('g2', lt, 2)}, 6) AS top2,
      round({E._top_ngram_char_fraction_sql('g4', lt, 4)}, 6) AS top4,
      round({E._dup_ngram_char_fraction_sql('g5', lt, 5)}, 6) AS dup5,
      round({E._dup_ngram_char_fraction_sql('g10', lt, 10)}, 6) AS dup10,
      round({E._dup_char_fraction_sql(lines)}, 6) AS dlc,
      round(CASE WHEN len({paras}) > 0 THEN
        1.0 - len(list_distinct({paras}))::DOUBLE / len({paras})
        ELSE 0.0 END, 6) AS dpr,
      round({E._dup_char_fraction_sql(paras)}, 6) AS dpc
    FROM g
    """
    assert_matches_oracle(out, duck, sql)


def test_corpus_report_approx_distinct_within_rsd(spark, sf_dir):
    """The HLL++ report mode agrees with the exact mode within a few
    rsd on the fixture, and all non-sketch columns are identical."""
    from sparkall_spark.operators.pipeline import corpus_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = corpus_report(docs).collect()[0]
    approx = corpus_report(docs, approx_distinct=True, approx_rsd=0.02).collect()[0]
    for c in ("n_docs", "total_tokens", "total_chars", "n_empty"):
        assert exact[c] == approx[c]
    rel = abs(approx["n_distinct"] - exact["n_distinct"]) / max(
        exact["n_distinct"], 1
    )
    assert rel < 0.1  # 5x the 2% rsd — deterministic sketch, no flake


# --- Unicode normalization ----------------------------------------------------


def test_unicode_normalize_nfc_matches_duckdb(spark, duck):
    from sparkall_spark.functions.text import unicode_normalize

    rows = [
        (1, "café"),            # precomposed
        (2, "café"),           # decomposed -> same NFC
        (3, "Å"),              # A + ring -> Å
        (4, None),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", unicode_normalize("s").alias("n")
        ).collect()
    }
    vals = ", ".join(
        f"({i}, {'NULL' if s is None else repr(s)})" for i, s in rows
    )
    mirror = dict(
        duck.execute(
            f"SELECT id, nfc_normalize(s) FROM (VALUES {vals}) t(id, s)"
        ).fetchall()
    )
    assert got == mirror
    assert got[1] == got[2] == "café"
    assert got[3] == "Å"
    assert got[4] is None
    # dedup consequence: byte-different inputs now fingerprint equal
    from sparkall_spark.functions.text import fingerprint

    fps = {
        r["id"]: r["fp"]
        for r in df.filter("id in (1, 2)")
        .select("id", fingerprint(unicode_normalize("s")).alias("fp"))
        .collect()
    }
    assert fps[1] == fps[2]


def test_strip_accents_matches_duckdb_on_canonical_text(spark, duck):
    from sparkall_spark.functions.text import strip_accents

    rows = [
        (1, "café crème"),
        (2, "Über Straße"),   # ß has no decomposition: kept
        (3, "naïve résumé"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", strip_accents("s").alias("n")).collect()
    }
    vals = ", ".join(
        f"({i}, {'NULL' if s is None else repr(s)})" for i, s in rows
    )
    mirror = dict(
        duck.execute(
            f"SELECT id, strip_accents(s) FROM (VALUES {vals}) t(id, s)"
        ).fetchall()
    )
    assert got == mirror
    assert got[1] == "cafe creme"
    assert got[2] == "Uber Straße"
    assert got[4] is None


def test_flesch_reading_ease_matches_sql_and_formula(spark, duck, sf_dir):
    """SQL-mirror equality on the real fixture plus a hand-computed
    case; no-words docs score NULL; terminator-less text counts as one
    sentence."""
    from sparkall_spark.functions.text import flesch_reading_ease, flesch_sql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: r["f"]
        for r in docs.select(
            "doc_id", flesch_reading_ease("text").alias("f")
        ).collect()
    }
    want = dict(
        duck.execute(
            f"SELECT doc_id, {flesch_sql('text')} FROM documents"
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # hand case: "The cat sat. It ran." -> 5 words, 2 sentences,
    # 5 one-syllable words
    row = spark.createDataFrame(
        [("The cat sat. It ran.",), ("",), ("   ",)], ["text"]
    ).select(flesch_reading_ease("text").alias("f")).collect()
    expect = round(206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5), 6)
    assert row[0]["f"] == expect
    assert row[1]["f"] is None and row[2]["f"] is None
