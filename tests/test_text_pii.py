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
