"""BPE tokenizer (operators/bpe.py): frequency-table training, the
classic merge loop, and Arrow-batched encoding — pinned against a
sequential pure-Python reference and hand-verifiable examples."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators import bpe as B


# --- training ---------------------------------------------------------------


def test_train_merges_classic_example():
    # the textbook corpus: 'low'x5, 'lower'x2, 'newest'x6, 'widest'x3.
    # Highest-frequency pairs merge first; ties break lexicographically.
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = B.train_bpe_merges(freqs, n_merges=4)
    # pair counts round 1: ('e','s') = 6+3 = 9 wins (vs ('s','t')=9 —
    # lexicographic tie-break picks ('e','s') first)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", B.EOW)
    assert len(merges) == 4


def test_train_merges_stops_when_no_repeats():
    # every word unique, every pair frequency 1 -> nothing to merge
    assert B.train_bpe_merges([("ab", 1), ("cd", 1)], n_merges=10) == []


def test_word_frequencies_topk_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], ["doc_id", "text"]
    )
    top = B.word_frequencies(df, max_words=3)
    assert top == [("a", 3), ("b", 3), ("c", 1)]  # freq desc, word asc


# --- encoding ---------------------------------------------------------------


def test_encode_word_greedy_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", B.EOW), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B._encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert B._encode_word("low", ranks) == ["low", B.EOW]
    assert B._encode_word("", ranks) == [B.EOW]


def test_encode_concat_invariant_and_counts(spark):
    """concat(tokens) == word + '</w>' for every word, under any merge
    table; zero merges degrade to characters + marker."""
    docs = spark.createDataFrame(
        [(1, "the lowest newest low"), (2, ""), (3, None)],
        ["doc_id", "text"],
    )
    merges = B.train_bpe(docs, n_merges=6, max_words=100)
    out = B.bpe_encode(docs, merges, emit_tokens=True).collect()
    rows = {r["doc_id"]: r for r in out}
    words = "the lowest newest low".split()
    toks = rows[1]["bpe_tokens"]
    assert "".join(toks) == "".join(w + B.EOW for w in words)
    assert rows[1]["n_bpe_tokens"] == len(toks)
    assert rows[2]["n_bpe_tokens"] == 0 and rows[2]["bpe_tokens"] == []
    assert rows[3]["n_bpe_tokens"] == 0
    bare = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_encode(docs, [], emit_tokens=False).collect()
    }
    # no merges: every char + one EOW marker per word
    assert bare[1] == sum(len(w) + 1 for w in words)


def test_encode_matches_sequential_reference(spark, sf_dir):
    """Distributed encode == the same pure-Python loop run sequentially
    on the driver, for the real fixture corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    merges = B.train_bpe(docs, n_merges=60, max_words=5_000)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_encode(docs, merges).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        n = sum(
            len(B._encode_word(w, ranks))
            for w in (row["text"] or "").lower().split()
        )
        assert got[row["doc_id"]] == n


def test_encode_partitioning_invariant_and_fewer_tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = B.train_bpe(docs, n_merges=80, max_words=5_000)
    a = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_encode(docs, merges).collect()
    }
    b = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_encode(docs.repartition(7), merges).collect()
    }
    assert a == b
    none = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_encode(docs, []).collect()
    }
    # merges only ever reduce the token count, and on a real corpus
    # they must actually bite
    assert all(a[k] <= none[k] for k in a)
    assert sum(a.values()) < sum(none.values())


def test_retraining_is_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    m1 = B.train_bpe(docs, n_merges=40, max_words=2_000)
    m2 = B.train_bpe(docs.repartition(5), n_merges=40, max_words=2_000)
    assert m1 == m2
