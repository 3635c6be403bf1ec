from pyspark.sql import functions as F

from sparkall_spark.operators import dedup as D


def test_exact_dedup_synthetic(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "Hello  World"),  # same after normalization
            (3, "different doc"),
            (4, "hello world"),
        ],
        ["doc_id", "text"],
    )
    out = D.exact_dedup(df)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3]


def test_exact_dedup_fixture(spark, duck, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = D.exact_dedup(df, use_fingerprint=False)
    n_expected = duck.execute(
        "SELECT count(*) FROM (SELECT min(doc_id) FROM documents GROUP BY text)"
    ).fetchone()[0]
    assert out.count() == n_expected


def test_minhash_pairs_match_exact_jaccard(spark, duck, sf_dir):
    """At threshold 0.9 the fixture's qualifying pairs are identical
    token sets -> LSH recall is exact; compare against all-pairs DuckDB."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_dedup_pairs(df, threshold=0.9).collect()
    }
    expected = {
        tuple(r)
        for r in duck.execute(
            """
        WITH t AS (
          SELECT doc_id,
                 list_distinct(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) toks
          FROM documents)
        SELECT a.doc_id, b.doc_id
        FROM t a, t b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.toks, b.toks))::DOUBLE
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
        """
        ).fetchall()
    }
    assert got == expected
    assert len(expected) > 0  # fixture has constructed near-dups


def test_minhash_dedup_removes_losers(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = D.minhash_dedup_pairs(df, threshold=0.9)
    kept = D.minhash_dedup(df, threshold=0.9)
    losers = {r["id_b"] for r in pairs.collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids.isdisjoint(losers)
    assert kept_ids | losers == {r["doc_id"] for r in df.collect()}


def test_simhash_identical_and_distinct(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally unrelated words nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    pairs = D.simhash_pairs(df, max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["hamming"] == 0


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with other words entirely"),
        ],
        ["doc_id", "text"],
    )
    pairs = D.ngram_jaccard_pairs(df, ngram=2, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_embedding_neardup_lsh_matches_exact_on_constructed(spark):
    """Constructed near-dup vectors (1e-2 perturbation => angle ~1e-2
    rad): the LSH default at bits=4/tables=16 must find every pair the
    exact path finds (per-pair miss probability < 1e-30 at this angle)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        pert = v + 0.01 * rng.standard_normal(64)
        rows.append((100 + i, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_neardup_pairs(
            df, threshold=0.95, bits=4, tables=16
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_neardup_pairs(df, threshold=0.95, exact=True).collect()
    }
    assert got == exact
    assert {(i, 100 + i) for i in range(20)} <= exact


def test_embedding_neardup_vs_oracle(spark, duck, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = D.embedding_neardup_pairs(
        df, threshold=0.8, left_filter=F.col("__id") % 10 == 0
    )
    rows = {(r["id_a"], r["id_b"]) for r in got.collect()}
    expected = {
        tuple(r)
        for r in duck.execute(
            """
        SELECT a.vec_id, b.vec_id
        FROM embeddings a, embeddings b
        WHERE a.vec_id % 10 = 0 AND a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.8
        """
        ).fetchall()
    }
    assert rows == expected
