"""PII detection/redaction + URL extraction (functions/text.py, r4).

Pure Column expressions over a Java-regex/RE2-common pattern subset;
every pattern is mirrored in DuckDB to prove engine portability.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkall_spark.functions import text as X

ROWS = [
    (1, "contact me at jane.doe+x@example.co.uk or on +1 (415) 555-0132."),
    (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
    (3, "see https://example.com/a/b?q=1 and http://sub.test.org"),
    (4, "no pii here, just text about 42 things"),
    (5, "mail root@localhost is not an email; 12345 is not a phone"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["id", "text"])


def test_redact_pii_masks_all_three(df):
    out = {
        r["id"]: r["red"]
        for r in df.select("id", X.redact_pii("text").alias("red")).collect()
    }
    assert out[1] == "contact me at [EMAIL] or on [PHONE]."
    assert out[2] == "server at [IPV4] and [IPV4] responded"
    assert out[4] == ROWS[3][1]  # untouched
    # root@localhost has no dotted domain -> not an email; 12345 too
    # short for a phone
    assert out[5] == ROWS[4][1]


def test_pii_count_matches_duckdb(df):
    got = {
        r["id"]: (r["e"], r["p"], r["i"])
        for r in df.select(
            "id",
            X.pii_count("text", "email").alias("e"),
            X.pii_count("text", "phone").alias("p"),
            X.pii_count("text", "ipv4").alias("i"),
        ).collect()
    }
    con = duckdb.connect()
    for rid, text in ROWS:
        e, p, i = (
            con.execute(
                "SELECT len(regexp_extract_all(?, ?)) FROM (VALUES (1))",
                [text, X.PII_PATTERNS[kind]],
            ).fetchone()[0]
            for kind in ("email", "phone", "ipv4")
        )
        assert got[rid] == (e, p, i), f"row {rid}"
    con.close()
    assert got[1] == (1, 1, 0) and got[2] == (0, 0, 2) and got[4] == (0, 0, 0)


def test_extract_urls_and_domains(df):
    out = {
        r["id"]: (sorted(r["u"]), sorted(r["d"]))
        for r in df.select(
            "id",
            X.extract_urls("text").alias("u"),
            X.url_domains("text").alias("d"),
        ).collect()
    }
    assert out[3] == (
        ["http://sub.test.org", "https://example.com/a/b?q=1"],
        ["example.com", "sub.test.org"],
    )
    assert out[4] == ([], [])
    # DuckDB mirror of the URL pattern
    con = duckdb.connect()
    mirror = con.execute(
        "SELECT regexp_extract_all(?, ?)",
        [ROWS[2][1], r"https?://[A-Za-z0-9.-]+(?:/[^\s]*)?"],
    ).fetchone()[0]
    con.close()
    assert sorted(mirror) == out[3][0]


def test_pipeline_redact_knob(spark):
    from sparkall_spark.operators.pipeline import prepare_documents

    docs = spark.createDataFrame(
        [
            (1, "a perfectly reasonable document with my mail a.b@c.org and "
                "enough plain words to pass the quality screen today"),
            (2, "a perfectly reasonable document without any mail and "
                "enough plain words to pass the quality screen today"),
        ],
        ["doc_id", "text"],
    )
    out = prepare_documents(docs, min_quality=0.0, redact_pii=True)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert "[EMAIL]" in texts[1] and "a.b@c.org" not in texts[1]
    assert texts[2] == docs.collect()[1]["text"]
    # still zero UDFs: the whole stage is codegen-able expressions
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- URL canonicalization + intra-doc paragraph dedup (r5) ----------------

_URLS = [
    "http://Example.COM:80/a//b/?utm_source=x&q=1#frag",
    "https://host:443/path/",
    "https://host.example./x",
    "http://a.b/p?utm_campaign=z",
    "http://a.b/p?q=1&utm_medium=m&r=2",
    "http://a.b/p?fbclid=abc",
    "not a url at all",
    "ftp://weird:21/x",
    "http://dup//dup///x//",
    "https://plain.org",
]


def test_canonical_url_cases_and_sql_mirror(spark, duck):
    from sparkall_spark.functions.text import canonical_url, canonical_url_sql

    df = spark.createDataFrame([(u,) for u in _URLS], "u string")
    got = [r["c"] for r in
           df.select(canonical_url("u").alias("c")).collect()]
    expect = [
        "http://example.com/a/b?q=1",
        "https://host/path",
        "https://host.example/x",
        "http://a.b/p",
        "http://a.b/p?q=1&r=2",
        "http://a.b/p",
        "not a url at all",
        "ftp://weird:21/x",
        "http://dup/dup/x",
        "https://plain.org",
    ]
    assert got == expect
    vals = ", ".join("('%s')" % u.replace("'", "''") for u in _URLS)
    mirror = [
        r[0]
        for r in duck.execute(
            f"SELECT {canonical_url_sql('u')} FROM (VALUES {vals}) t(u)"
        ).fetchall()
    ]
    assert mirror == expect  # character-for-character engine agreement


def test_url_dedup_collapses_recrawls(spark):
    from sparkall_spark.operators.dedup import url_dedup

    rows = [
        (1, "http://Example.COM:80/a?utm_source=x"),
        (2, "http://example.com/a"),          # same canonical as 1
        (3, "http://example.com/a?q=1"),      # different
        (4, "http://example.com/a#section"),  # same canonical as 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert kept == [1, 3]


def test_dedup_paragraphs_keeps_first_occurrence(spark):
    from sparkall_spark.functions.text import dedup_paragraphs

    text = "\n\n".join(["intro", "AD BLOCK", "body one", "AD BLOCK ",
                        "body two", "intro"])
    df = spark.createDataFrame([(text,)], "t string")
    out = df.select(dedup_paragraphs("t").alias("c")).collect()[0]["c"]
    # trimmed-exact matching: 'AD BLOCK ' duplicates 'AD BLOCK'
    assert out == "\n\n".join(["intro", "AD BLOCK", "body one", "body two"])


def test_dedup_paragraphs_noop_and_empty(spark):
    from sparkall_spark.functions.text import dedup_paragraphs

    df = spark.createDataFrame(
        [("a\n\nb",), ("",), ("solo",)], "t string"
    )
    got = [r["c"] for r in df.select(dedup_paragraphs("t").alias("c")).collect()]
    assert got == ["a\n\nb", "", "solo"]


def test_pipeline_url_and_paragraph_knobs(spark):
    from sparkall_spark.operators.pipeline import prepare_documents

    body = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, "http://a.b/x?utm_source=s", "intro\n\n" + body),
        (2, "http://a.b/x", "other\n\n" + body + " tail"),  # same canonical
        (3, "http://a.b/y", "rep\n\nrep\n\n" + body),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = prepare_documents(
        df, min_quality=0.0, url_dedup_col="url", paragraph_dedup=True
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1, 3}  # doc 2 collapsed onto doc 1's URL
    assert got[3] == "rep\n\n" + body  # repeated paragraph removed


def test_canonical_url_hypothesis_engine_agreement(spark, duck):
    """Random URL-ish ASCII inputs: the Spark Column chain and the
    DuckDB mirror must agree character for character (the regexes are
    deliberately in the Java-regex/RE2 common subset)."""
    from hypothesis import given, settings, strategies as st

    from sparkall_spark.functions.text import canonical_url, canonical_url_sql

    piece = st.sampled_from([
        "http://", "https://", "HTTP://", "ftp://", "", "Example.COM",
        "host", ":80", ":443", ":8080", "/", "//", "/a", "/a/b/", ".",
        "?", "&", "q=1", "utm_source=x", "utm_=", "fbclid=z", "ref=r",
        "#frag", "#", "x y", "%20", "..", "a.b.c", "?&&", "=",
    ])
    url = st.lists(piece, min_size=0, max_size=8).map("".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(url, min_size=1, max_size=8))
    def check(urls):
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        got = [r["c"] for r in
               df.select(canonical_url("u").alias("c")).collect()]
        vals = ", ".join("('%s')" % u.replace("'", "''") for u in urls)
        mirror = [
            r[0]
            for r in duck.execute(
                f"SELECT {canonical_url_sql('u')} FROM (VALUES {vals}) t(u)"
            ).fetchall()
        ]
        assert got == mirror

    check()
