"""Document chunking: sliding token windows (operators/chunking.py).

Oracle: DuckDB computes the same windows via string_split +
generate_series + list_slice.  Plan checks: no UDF (pure Column
exprs), no Exchange (narrow transformation)."""

import pytest

from sparkall_spark.operators.chunking import chunk_documents
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_chunk_small_examples(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "x y"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=3, stride=2).collect()
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in out
    }
    assert got[(1, 0)] == ("a b c", 3)
    assert got[(1, 1)] == ("c d e", 3)
    assert got[(1, 2)] == ("e f g", 3)
    assert got[(1, 3)] == ("g", 1)
    assert got[(2, 0)] == ("x y", 2)
    # empty / null documents yield one empty chunk, not zero rows
    assert got[(3, 0)] == ("", 0)
    assert got[(4, 0)] == ("", 0)
    assert len(got) == 7


def test_chunk_matches_duckdb_oracle(docs, duck):
    out = chunk_documents(docs, chunk_tokens=40, stride=30)
    oracle = """
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN text IS NULL OR trim(text) = '' THEN []
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    ),
    win AS (
        SELECT doc_id, t,
               unnest(generate_series(0, greatest(len(t) - 1, 0), 30)) AS g
        FROM toks
    )
    SELECT doc_id,
           CAST(g / 30 AS BIGINT) AS chunk_id,
           array_to_string(list_slice(t, g + 1, g + 40), ' ') AS chunk_text,
           CAST(len(list_slice(t, g + 1, g + 40)) AS BIGINT) AS n_tokens
    FROM win
    """
    assert_matches_oracle(out, duck, oracle)


def test_chunk_total_token_conservation(docs):
    """With stride == chunk_tokens (no overlap), chunks partition the
    token stream: sum of chunk n_tokens == total tokens."""
    from pyspark.sql import functions as F

    out = chunk_documents(docs, chunk_tokens=64, stride=64)
    total_chunks = out.agg(F.sum("n_tokens")).first()[0]
    total_tokens = (
        docs.select(
            F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).agg(F.sum("n")).first()[0]
    )
    assert total_chunks == total_tokens


def test_chunk_plan_is_narrow_and_udf_free(docs):
    out = chunk_documents(docs, chunk_tokens=32, stride=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow: chunks made where docs live
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_validation():
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(None, chunk_tokens=10, stride=11)
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(None, chunk_tokens=0)


def test_cdc_chunks_cover_payload_and_are_content_defined(spark):
    """Chunks tile each payload exactly; identical content yields
    identical chunk hashes wherever it appears; an INSERTION re-shifts
    only chunks at/after the edit (the CDC property)."""
    import random

    from pyspark.sql import functions as F

    from sparkall_spark.operators.chunking import cdc_chunk_payloads

    rng = random.Random(3)
    base = bytes(rng.randrange(256) for _ in range(40_000))
    edited = base[:9_000] + b"INSERTED-BYTES" + base[9_000:]
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(edited)), (3, None),
         (4, bytearray(b""))],
        "media_id long, payload binary",
    )
    out = cdc_chunk_payloads(df, avg_size=1024).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {1, 2}  # null/empty payloads emit nothing
    for mid, size in ((1, len(base)), (2, len(edited))):
        rows = sorted(by_id[mid], key=lambda r: r["chunk_idx"])
        assert rows[0]["offset"] == 0
        assert sum(r["length"] for r in rows) == size
        for a, b in zip(rows, rows[1:]):
            assert b["offset"] == a["offset"] + a["length"]  # exact tiling
        assert all(r["length"] <= 4096 for r in rows)  # max_size cap

    h1 = [r["chunk_hash"] for r in sorted(by_id[1], key=lambda r: r["chunk_idx"])]
    h2 = [r["chunk_hash"] for r in sorted(by_id[2], key=lambda r: r["chunk_idx"])]
    shared = set(h1) & set(h2)
    # most chunks survive the insertion byte-identically
    assert len(shared) >= len(h1) - 3
    # deterministic across partitionings
    again = cdc_chunk_payloads(df.repartition(4), avg_size=1024).collect()
    assert sorted((r["media_id"], r["chunk_idx"], r["chunk_hash"]) for r in again) \
        == sorted((r["media_id"], r["chunk_idx"], r["chunk_hash"]) for r in out)


def test_cdc_chunk_validation(spark):
    import pytest as _pytest

    from sparkall_spark.operators.chunking import cdc_chunk_payloads

    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "media_id long, payload binary")
    with _pytest.raises(ValueError, match="avg_size"):
        cdc_chunk_payloads(df, avg_size=16)
    with _pytest.raises(ValueError, match="min_size"):
        cdc_chunk_payloads(df, avg_size=1024, min_size=2048)


def test_cdc_min_size_holds_after_forced_cuts(spark):
    """r8 review: a content cut landing just past a forced max_size
    boundary must not emit a sub-min fragment."""
    from sparkall_spark.operators.chunking import cdc_chunk_payloads

    # constant bytes: gear hash of a constant buffer either cuts
    # everywhere or nowhere; either way every emitted chunk must
    # respect min_size except the final remainder
    df = spark.createDataFrame(
        [(1, bytearray(b"\x42" * 20_000))], "media_id long, payload binary"
    )
    rows = sorted(
        cdc_chunk_payloads(df, avg_size=1024).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert sum(r["length"] for r in rows) == 20_000
    assert all(r["length"] >= 256 for r in rows[:-1])  # min_size=avg/4
    assert all(r["length"] <= 4096 for r in rows)
