"""Boilerplate line removal: Python oracle, planted chrome, strategy
equivalence (map-side collect vs distributed rebuild), plan shape."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.boilerplate import (
    line_doc_frequency,
    remove_boilerplate_lines,
)

MIN_CHARS = 4


def _py_oracle(rows, min_docs, min_line_chars=MIN_CHARS):
    """Reference implementation in plain Python."""
    def norm(ln):
        return ln.strip().lower()

    df_count = {}
    for _id, text in rows:
        for ln in {norm(x) for x in text.split("\n")}:
            if len(ln) >= min_line_chars:
                df_count[ln] = df_count.get(ln, 0) + 1
    frequent = {ln for ln, c in df_count.items() if c >= min_docs}
    out = {}
    for _id, text in rows:
        kept = [
            x
            for x in text.split("\n")
            if len(norm(x)) < min_line_chars or norm(x) not in frequent
        ]
        out[_id] = "\n".join(kept)
    return out


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, "unique first line\nCopyright 2026 Example Corp\nreal content A"),
        (2, "Copyright 2026 Example Corp\nreal content B\n\nmore B"),
        (3, "COPYRIGHT 2026 example corp\nreal content C\nok"),
        (4, "nothing shared here\nat all today"),
        (5, "Copyright 2026 Example Corp"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id int, text string")


def test_planted_chrome_removed_matches_python_oracle(planted):
    rows, df = planted
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert got == _py_oracle(rows, min_docs=3)
    # the banner (3 docs, case-insensitive) is gone everywhere; doc 5
    # becomes empty; 'ok' (2 chars) is structural and survives
    assert "Copyright" not in got[1] and got[1].startswith("unique")
    assert got[5] == ""
    assert got[3] == "real content C\nok"
    # blank line in doc 2 is preserved
    assert got[2] == "real content B\n\nmore B"


def test_doc_frequency_counts_distinct_docs(planted, spark):
    _rows, df = planted
    freq = {
        r["line"]: r["n_docs"]
        for r in line_doc_frequency(df).collect()
    }
    assert freq["copyright 2026 example corp"] == 4  # docs 1, 2, 3, 5
    assert freq["real content a"] == 1


def test_strategies_agree_on_fixture_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fast = remove_boilerplate_lines(docs, min_docs=5)
    slow = remove_boilerplate_lines(docs, min_docs=5, collect_limit=0)
    a = sorted((r["doc_id"], r["text"]) for r in fast.collect())
    b = sorted((r["doc_id"], r["text"]) for r in slow.collect())
    assert a == b
    # and against the Python oracle
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    want = _py_oracle(rows, min_docs=5)
    assert dict(a) == want


def test_min_doc_frac_threshold(planted):
    rows, df = planted
    # 3/5 docs = 0.6 frac; threshold int(0.5*5)+1 = 3 -> removed
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(
            df, min_docs=2, min_doc_frac=0.5
        ).collect()
    }
    assert got == _py_oracle(rows, min_docs=3)


def test_no_udf_and_single_count_shuffle(planted):
    _rows, df = planted
    out = remove_boilerplate_lines(df, min_docs=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # map-side strategy: the returned plan is a pure projection over the
    # source (the frequency shuffle ran in the gate jobs, not here)
    assert "Exchange hashpartitioning" not in plan
