import pytest
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


def test_semdedup_constructed_clusters(spark):
    """Two well-separated directions with planted near-dup copies and
    fixed centroids: survivors are exactly the min-id member of each
    near-dup group; the distant outlier in each cell survives."""
    import numpy as np

    rng = np.random.default_rng(3)
    a = rng.standard_normal(16)
    b = rng.standard_normal(16)
    b -= (a @ b) / (a @ a) * a  # orthogonalize -> two clean cells
    rows = []
    for i, base in ((0, a), (100, b)):
        rows.append((i, [float(x) for x in base]))
        rows.append((i + 1, [float(x) for x in base * 1.02 + 0.001]))
        rows.append((i + 2, [float(x) for x in base * 0.97]))
        # same cell but far from the dup group: negate half the dims
        far = base.copy()
        far[::2] *= -0.2
        rows.append((i + 50, [float(x) for x in far]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = D.semdedup(df, threshold=0.99, centroids=np.stack([a, b]))
    survivors = {r["vec_id"] for r in out.collect()}
    assert survivors == {0, 50, 100, 150}


def test_semdedup_vs_duckdb_oracle(spark, duck, sf_dir):
    """Fixture embeddings + planted affine near-dups, fixed seeded
    centroids: full survivor-set agreement with the SQL mirror (cell
    argmax, within-cell pruning, greedy min-id keep)."""
    import numpy as np

    cents = np.random.default_rng(123).standard_normal((8, 64))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * F.lit(1.01) + F.lit(0.002),
        ).alias("embedding"),
    )
    aug = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted)
    out = D.semdedup(aug, threshold=0.95, centroids=cents)

    structs = ", ".join(
        "{'s': round(list_cosine_similarity(e, ["
        + ", ".join(repr(float(x)) for x in cent)
        + f"]), 6), 'cell': {j}}}"
        for j, cent in enumerate(cents)
    )
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        out,
        duck,
        f"""
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[],
                                         x -> x * 1.01 + 0.002)
  FROM embeddings WHERE vec_id % 40 = 0),
cellinfo AS (
  SELECT vec_id, e,
         list_reverse(list_sort([{structs}]))[1].cell AS cell
  FROM aug),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cellinfo a JOIN cellinfo b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.95)
SELECT vec_id, CAST(cell AS INT) AS cell FROM cellinfo
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
""",
    )


def test_semdedup_trained_centroids_and_plan(spark, sf_dir):
    """Default path (driver-sample k-means): removes planted dups, and
    the plan is hash-join-only (no cartesian/BNLJ all-pairs)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    aug = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted)
    out = D.semdedup(aug, threshold=0.999, n_cells=8, seed=11)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    survivors = {r["vec_id"] for r in out.collect()}
    n_emb = emb.count()
    # every planted exact copy shares its source's cell -> dropped
    assert survivors == {r["vec_id"] for r in emb.collect()} or len(
        survivors
    ) == n_emb
    assert all(v < 100000 for v in survivors)


def test_semdedup_arrow_assignment_matches_column(spark, sf_dir):
    """The Arrow-batched matmul cell assignment (scale path, default)
    and the pure-Column expression agree on every fixture vector —
    identical HALF-UP 6dp rounding and tie-to-higher-cell semantics."""
    import numpy as np

    cents = np.random.default_rng(123).standard_normal((8, 64))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {
        (r["vec_id"], r["cell"])
        for r in D.semdedup(emb, threshold=0.95, centroids=cents,
                            assign="arrow").collect()
    }
    b = {
        (r["vec_id"], r["cell"])
        for r in D.semdedup(emb, threshold=0.95, centroids=cents,
                            assign="column").collect()
    }
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        D.semdedup(emb, centroids=cents, assign="bogus")


def test_semdedup_zero_norm_duplicates_survive(spark):
    """Duplicate all-zero embeddings score cosine 0.0 under the module's
    definition, so the documented pair rule (cosine >= threshold) keeps
    them — the identical-vector collapse must not silently dedup them
    (ADVICE r4)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = [float(x) for x in rng.standard_normal(8)]
    cents = rng.standard_normal((2, 8))
    rows = [
        (1, [0.0] * 8),
        (2, [0.0] * 8),          # exact zero duplicate: must survive
        (10, base),
        (11, base),              # exact nonzero duplicate: collapsed away
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = D.semdedup(df, threshold=0.95, centroids=cents)
    survivors = {r["vec_id"] for r in out.collect()}
    assert survivors == {1, 2, 10}


def test_semdedup_empty_input(spark):
    """Empty input returns an empty (id, cell) frame instead of crashing
    centroid training on an empty sample (ADVICE r4)."""
    df = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = D.semdedup(df, threshold=0.95, n_cells=4)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cell"]


def test_semdedup_max_cell_size_guard(spark):
    """The oversized-cell salt guard: on near-dup cliques the two-phase
    (within-salt, then cross-salt over survivors) result equals the
    plain single-pass result; oversize='error' refuses instead."""
    import numpy as np

    import pytest as _pytest

    rng = np.random.default_rng(13)
    a = rng.standard_normal(16)
    b = rng.standard_normal(16)
    b -= (a @ b) / (a @ a) * a
    cents = np.stack([a, b])
    rows = []
    # two near-dup cliques (distinct values -> collapse is a no-op) plus
    # an isolated far row per cell
    for start, base in ((0, a), (1000, b)):
        for i in range(60):
            v = base * (1.0 + 1e-4 * i)
            v[0] += 1e-6 * i
            rows.append((start + i, [float(x) for x in v]))
        far = base.copy()
        far[::2] *= -0.2
        rows.append((start + 500, [float(x) for x in far]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    plain = {
        r["vec_id"]
        for r in D.semdedup(df, threshold=0.99, centroids=cents).collect()
    }
    salted = {
        r["vec_id"]
        for r in D.semdedup(
            df, threshold=0.99, centroids=cents, max_cell_size=10
        ).collect()
    }
    assert plain == salted == {0, 500, 1000, 1500}

    with _pytest.raises(ValueError, match="max_cell_size"):
        D.semdedup(
            df, threshold=0.99, centroids=cents, max_cell_size=10,
            oversize="error",
        )
    # a cap nothing exceeds: error mode passes through to the plain path
    ok = {
        r["vec_id"]
        for r in D.semdedup(
            df, threshold=0.99, centroids=cents, max_cell_size=100,
            oversize="error",
        ).collect()
    }
    assert ok == plain
    with _pytest.raises(ValueError, match="oversize"):
        D.semdedup(df, centroids=cents, max_cell_size=10, oversize="bogus")


# --- incremental exact dedup (r5) -----------------------------------------

_FP_SQL_T = """list_reduce(
  list_prepend(0::BIGINT,
    [ascii(c) FOR c IN
       list_filter(string_split(
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ''),
         x -> x <> '')]),
  (acc, c) -> (acc * 31 + c) % 1000000007)"""


def test_incremental_dedup_cold_start_equals_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept, delta = D.exact_dedup_incremental(docs, None)
    plain = D.exact_dedup(docs)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == (
        sorted(r["doc_id"] for r in plain.select("doc_id").collect())
    )
    assert delta.count() == kept.count()


def test_incremental_dedup_is_idempotent_and_filters_seen(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    # batch 2: genuinely new docs + replays of batch-1 docs under NEW ids
    new = docs.filter(F.col("doc_id") % 2 == 1)
    replay = b1.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    b2 = new.unionByName(replay)

    kept1, delta1 = D.exact_dedup_incremental(b1, None)
    kept2, delta2 = D.exact_dedup_incremental(b2, delta1)
    got = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    # replayed content is gone; only content not already in batch 1 stays
    assert all(i < 1000000 for i in got)
    expect_new = {
        r["doc_id"]
        for r in D.exact_dedup(new).select("doc_id").collect()
    }
    seen_fps = {r["fingerprint"] for r in delta1.collect()}
    from sparkall_spark.operators.dedup import fingerprint as _fp
    new_fps = {
        r["doc_id"]: r["f"]
        for r in new.select("doc_id", _fp("text").alias("f")).collect()
    }
    expect = {i for i in expect_new if new_fps[i] not in seen_fps}
    assert got == expect
    # replaying an already-applied batch is a no-op
    ledger = delta1.unionByName(delta2)
    kept_again, _ = D.exact_dedup_incremental(b2, ledger)
    assert kept_again.count() == 0


def test_incremental_dedup_matches_sql_mirror(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    _, delta1 = D.exact_dedup_incremental(b1, None)
    kept2, _ = D.exact_dedup_incremental(
        b2, delta1, broadcast_seen=True
    )
    sql = f"""
WITH fp AS (SELECT doc_id, {_FP_SQL_T} AS f FROM documents),
b1 AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0),
b2 AS (
  SELECT doc_id, f, row_number() OVER (PARTITION BY f ORDER BY doc_id) rn
  FROM fp WHERE doc_id % 2 = 1)
SELECT doc_id FROM b2
WHERE rn = 1 AND f NOT IN (SELECT f FROM b1)
"""
    assert_matches_oracle(kept2.select("doc_id"), duck, sql)


def test_ingest_documents_end_to_end(spark, sf_dir, tmp_path):
    from sparkall_spark.operators.pipeline import (
        ingest_documents,
        rebuild_ledger,
    )

    corpus = str(tmp_path / "corpus")
    ledger = str(tmp_path / "ledger")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs  # half replays b1's content under the same ids

    n1 = ingest_documents(spark, b1, corpus, ledger)
    assert n1 == D.exact_dedup(b1).count()
    n2 = ingest_documents(spark, b2, corpus, ledger)
    got = spark.read.parquet(corpus)
    assert got.count() == n1 + n2
    # corpus text content is globally unique
    assert got.select("text").distinct().count() == n1 + n2
    # replaying batch 2 is a no-op
    assert ingest_documents(spark, b2, corpus, ledger) == 0
    # ledger repair reproduces the same fingerprint set
    before = {r["fingerprint"]
              for r in spark.read.parquet(ledger).collect()}
    rebuild_ledger(spark, corpus, ledger)
    after = {r["fingerprint"]
             for r in spark.read.parquet(ledger).collect()}
    assert before == after


def test_incremental_dedup_bucketed_ledger_single_exchange(spark, sf_dir):
    """The docstring's scale claim, pinned: with the ledger written
    bucketed on the fingerprint, the batch-vs-ledger anti-join adds NO
    exchange beyond the batch window's own (the ledger scan exposes
    bucketed partitioning; the batch side reuses the window's hash
    partitioning on the same key)."""
    from sparkall_spark.sources import sinks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, delta = D.exact_dedup_incremental(
        docs.filter(F.col("doc_id") % 2 == 0), None
    )
    sinks.write_bucketed(delta, "fp_ledger", ["fingerprint"], num_buckets=4)
    try:
        ledger = spark.table("fp_ledger")
        kept, _ = D.exact_dedup_incremental(
            docs.filter(F.col("doc_id") % 2 == 1), ledger
        )
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1
        # and the result is still exactly the unseen half's dedup
        n = kept.count()
        assert n > 0
    finally:
        spark.sql("DROP TABLE fp_ledger")


# --- sentence-level dedup (r6) ----------------------------------------------


def test_sentences_segmentation(spark):
    from sparkall_spark.functions.text import sentences

    df = spark.createDataFrame(
        [
            (1, "Hello there. How are you? Fine!"),
            (2, "a...b"),
            (3, ""),
            (4, "no terminator"),
            (5, "Multi.  space.   "),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["s"] for r in df.select("id", sentences("text").alias("s")).collect()}
    assert got[1] == ["Hello there.", "How are you?", "Fine!"]
    assert got[2] == ["a...", "b"]
    assert got[3] == []
    assert got[4] == ["no terminator"]
    assert got[5] == ["Multi.", "space."]


def test_minhash_shuffle_candidates_emitted_exactly_once(spark, sf_dir):
    """r7: the shuffle path replaced the collision-stream distinct with
    map-side first-matching-band emission — a pair colliding in k bands
    must still appear exactly once, and the PPJoin prefix filter must
    lose no qualifying pair (output identical to the broadcast path,
    which uses an independent first-match mechanism)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = D.minhash_dedup_pairs(
        docs, threshold=0.9, broadcast_reps=True, candidate_strategy="shuffle"
    )
    assert sh.groupBy("id_a", "id_b").count().filter("count > 1").count() == 0
    bc = D.minhash_dedup_pairs(
        docs, threshold=0.9, broadcast_reps=True,
        candidate_strategy="broadcast",
    )
    a = sorted(map(tuple, sh.collect()))
    b = sorted(map(tuple, bc.collect()))
    assert a == b


def test_prefix_len_matches_allpairs_bound(spark):
    """_prefix_len must equal n - ceil(t*n) + 1 (the AllPairs/PPJoin
    Jaccard prefix), never shorter — shorter would drop true pairs."""
    import math

    from sparkall_spark.operators.dedup import _prefix_len

    rows = spark.createDataFrame([(n,) for n in range(1, 60)], ["n"])
    for t in (0.5, 0.8, 0.9, 0.95):
        got = {
            r["n"]: r["p"]
            for r in rows.select(
                "n", _prefix_len(F.col("n"), t).alias("p")
            ).collect()
        }
        for n in range(1, 60):
            assert got[n] == n - math.ceil(t * n) + 1, (t, n)


def test_sentence_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            # doc 1 defines both sentences; within-doc repeat of A removed
            (1, "Sent A. Sent B. Sent A."),
            # doc 2 repeats A (cross-doc) and adds its own
            (2, "Sent A. Fresh C."),
            # doc 3 entirely boilerplate -> empty rebuild
            (3, "Sent B. Fresh C."),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in D.sentence_dedup(df).collect()}
    assert out[1]["text"] == "Sent A. Sent B."
    assert (out[1]["n_sentences"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["text"] == "Fresh C."
    assert (out[2]["n_sentences"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["text"] == ""
    assert (out[3]["n_sentences"], out[3]["n_kept"]) == (2, 0)
    assert out[4]["text"] == ""
    assert (out[4]["n_sentences"], out[4]["n_kept"]) == (0, 0)


def test_sentence_dedup_hash_key_equals_string_key(spark):
    """The 100 TB ``key='hash'`` form (8-byte xxhash64 shuffle keys)
    must produce row-for-row identical output to the oracle-mirrored
    string-key default on the documents fixture (r6 VERDICT item 6 —
    collisions are a 2^-64-per-pair event, absent at any test scale)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = D.sentence_dedup(docs, key="sentence")
    b = D.sentence_dedup(docs, key="hash")
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    sa = sorted(map(tuple, a.select(*cols).collect()))
    sb = sorted(map(tuple, b.select(*cols).collect()))
    assert sa == sb
    import pytest as _pytest

    with _pytest.raises(ValueError):
        D.sentence_dedup(docs, key="bogus")


def test_sentence_dedup_hash_key_winner_deterministic(spark):
    """Within-corpus repeats: hash path keeps the globally-first
    occurrence exactly like the string path."""
    df = spark.createDataFrame(
        [(1, "Sent A. Sent B. Sent A."), (2, "Sent A. Fresh C.")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in D.sentence_dedup(df, key="hash").collect()}
    assert out[1]["text"] == "Sent A. Sent B."
    assert out[2]["text"] == "Fresh C."


def test_sentence_dedup_preserves_order_and_extra_columns(spark):
    df = spark.createDataFrame(
        [
            (10, "z last. a first. m mid.", "keep-me"),
            (11, "a first. z last.", "extra"),
        ],
        ["doc_id", "text", "meta"],
    )
    out = {r["doc_id"]: r for r in D.sentence_dedup(df).collect()}
    # original in-document order survives the rebuild (not sorted text)
    assert out[10]["text"] == "z last. a first. m mid."
    assert out[10]["meta"] == "keep-me"
    assert out[11]["text"] == ""
    assert out[11]["meta"] == "extra"


# --- r7: incremental NEAR-dup dedup against a minhash ledger ---------------


def test_minhash_incremental_constructed_semantics(spark):
    """Constructed corpus/batch: ledger near-dups die, within-batch
    dominated docs die, unique docs survive, empty docs pass through
    (documented) and never enter the delta."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            # identical to corpus doc 1 -> dropped via ledger
            (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            # unique -> kept
            (101, "completely fresh material nothing shared anywhere"),
            # identical within-batch pair, no corpus match:
            # 102 kept (min id), 103 dominated
            (102, "red orange yellow green blue indigo violet pink brown black"),
            (103, "red orange yellow green blue indigo violet pink brown black"),
            # empty -> kept (documented pass-through), absent from delta
            (104, ""),
        ],
        ["doc_id", "text"],
    )
    ledger = D.minhash_ledger_table(corpus)
    kept, delta = D.minhash_dedup_incremental(batch, ledger)
    assert sorted(r["doc_id"] for r in kept.collect()) == [101, 102, 104]
    assert sorted(r["doc_id"] for r in delta.collect()) == [101, 102]
    assert delta.columns == [
        "doc_id", "n_shingles", "shingle_hashes", "band_hashes",
    ]


def test_minhash_incremental_idempotent_replay(spark):
    """Appending the delta and replaying the same batch keeps nothing
    (every doc is jaccard 1.0 against its own ledger row)."""
    corpus = spark.createDataFrame(
        [(1, "base corpus document with some tokens inside it")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, "a brand new document about ships and harbors"),
            (11, "another new document about trains and stations"),
        ],
        ["doc_id", "text"],
    )
    ledger = D.minhash_ledger_table(corpus)
    kept, delta = D.minhash_dedup_incremental(batch, ledger)
    assert kept.count() == 2
    ledger2 = ledger.unionByName(delta)
    kept2, delta2 = D.minhash_dedup_incremental(batch, ledger2)
    assert kept2.count() == 0
    assert delta2.count() == 0


def test_minhash_incremental_cold_start_equals_dominated_dedup(spark, sf_dir):
    """ledger=None reduces to the within-batch dominated rule — exactly
    minhash_dedup (drop every id that appears as a pair's id_b)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept, delta = D.minhash_dedup_incremental(docs, None)
    expected = {r["doc_id"] for r in D.minhash_dedup(docs).collect()}
    got = {r["doc_id"] for r in kept.collect()}
    assert got == expected
    # the delta is EXACTLY the kept docs that have shingles — a delta
    # that silently dropped kept rows would break cross-batch
    # near-dedup on the next ingest
    with_shingles = {
        r["doc_id"] for r in D.minhash_ledger_table(docs).collect()
    }
    assert {r["doc_id"] for r in delta.collect()} == got & with_shingles


def test_minhash_incremental_matches_sql_mirror(spark, duck, sf_dir):
    """Fixture split 3:1 into corpus/batch; kept set equals the
    non-recursive mirror (no ledger near-dup, no smaller-id dominating
    survivor) computed via all-pairs exact jaccard in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    ledger = D.minhash_ledger_table(corpus)
    kept, _delta = D.minhash_dedup_incremental(batch, ledger)
    got = sorted(r["doc_id"] for r in kept.collect())
    expected = [
        r[0]
        for r in duck.execute(
            """
        WITH t AS (
          SELECT doc_id,
                 list_distinct(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) toks
          FROM documents),
        corpus AS (SELECT * FROM t WHERE doc_id % 4 != 0 AND len(toks) > 0),
        batch  AS (SELECT * FROM t WHERE doc_id % 4 = 0),
        dropped_l AS (
          SELECT DISTINCT b.doc_id
          FROM batch b JOIN corpus c
            ON len(b.toks) > 0
           AND len(list_intersect(b.toks, c.toks))::DOUBLE
               / len(list_distinct(list_concat(b.toks, c.toks))) >= 0.9),
        surv AS (
          SELECT * FROM batch
          WHERE doc_id NOT IN (SELECT doc_id FROM dropped_l)),
        dom AS (
          SELECT DISTINCT b.doc_id
          FROM surv b JOIN surv a
            ON a.doc_id < b.doc_id AND len(a.toks) > 0 AND len(b.toks) > 0
           AND len(list_intersect(a.toks, b.toks))::DOUBLE
               / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9)
        SELECT doc_id FROM surv
        WHERE doc_id NOT IN (SELECT doc_id FROM dom)
        ORDER BY doc_id
        """
        ).fetchall()
    ]
    assert got == expected
    assert len(expected) > 0


def test_minhash_incremental_ledger_scan_is_broadcast_joined(spark):
    """The vs-ledger check must read the ledger with broadcast joins
    only — no shuffle of the corpus side (the 100 TB contract)."""
    corpus = spark.createDataFrame(
        [(i, f"corpus doc number {i} with shared filler tokens")
         for i in range(1, 40)],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(100, "corpus doc number 7 with shared filler tokens")],
        ["doc_id", "text"],
    )
    ledger = D.minhash_ledger_table(corpus)
    sigs = D.minhash_ledger_table(batch)
    dropped = D._ledger_dropped_ids(sigs, ledger, "doc_id", 16, 0.9)
    plan = dropped._jdf.queryExecution().executedPlan().toString()
    # both batch attachments broadcast; the ledger side is never
    # sort-merge-exchanged — its only Exchange is the final bounded
    # dropped-id distinct
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert [r["doc_id"] for r in dropped.collect()] == [100]


def test_byte_string_as_bytes_honors_suffixes():
    """r7 ADVICE item 1: '128m' parsed as 128 BYTES inflated the split
    estimate ~10^6x and silently skipped the under-parallelism
    repartition; the parser must honor the JVM's binary suffixes."""
    from sparkall_spark.operators.dedup import _byte_string_as_bytes as f

    assert f("134217728") == 134217728
    assert f("134217728b") == 134217728
    assert f("128m") == 128 << 20
    assert f("128MB") == 128 << 20
    assert f("1g") == 1 << 30
    assert f(" 64k ") == 64 << 10


# --- incremental SEMANTIC (embedding) dedup ----------------------------------


def _affine(v, a=1.01, b=0.002):
    return [x * a + b for x in v]


@pytest.fixture(scope="module")
def emb_small(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .filter(F.col("vec_id") < 60)
    )


def test_embedding_incremental_drops_ledger_neardups(spark, emb_small):
    from sparkall_spark.operators.dedup import (
        embedding_dedup_incremental,
        embedding_ledger_table,
    )

    corpus = emb_small.filter(F.col("vec_id") < 40)
    ledger = embedding_ledger_table(corpus)
    # batch: copies of 3 corpus vectors (near-dups) + 3 novel vectors
    copies = corpus.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(1.01) + F.lit(0.002)
        ).alias("embedding"),
    )
    novel = emb_small.filter(
        (F.col("vec_id") >= 40) & (F.col("vec_id") < 43)
    )
    kept, delta = embedding_dedup_incremental(
        novel.unionByName(copies), ledger, threshold=0.99
    )
    kept_ids = {r["vec_id"] for r in kept.collect()}
    assert kept_ids == {40, 41, 42}
    assert {r["vec_id"] for r in delta.collect()} == kept_ids


def test_embedding_incremental_within_batch_dominated_and_cold_start(
    spark, emb_small
):
    from sparkall_spark.operators.dedup import embedding_dedup_incremental

    base = emb_small.filter(F.col("vec_id") < 5)
    copies = base.select(
        (F.col("vec_id") + 500).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(0.99) + F.lit(0.001)
        ).alias("embedding"),
    )
    kept, delta = embedding_dedup_incremental(
        base.unionByName(copies), ledger=None, threshold=0.99
    )
    # cold start: smaller-id original survives, its copy is dominated
    assert {r["vec_id"] for r in kept.collect()} == {0, 1, 2, 3, 4}
    assert delta.count() == 5


def test_embedding_incremental_idempotent_and_nullsafe(spark, emb_small):
    from sparkall_spark.operators.dedup import (
        embedding_dedup_incremental,
        embedding_ledger_table,
    )

    corpus = emb_small.filter(F.col("vec_id") < 10)
    ledger = embedding_ledger_table(corpus)
    # replaying the ledgered batch keeps nothing (qcos 1.0 vs own row)
    kept, _ = embedding_dedup_incremental(corpus, ledger, threshold=0.99)
    assert kept.count() == 0
    # null / wrong-dim / zero vectors carry no ledger row: pass through
    weird = spark.createDataFrame(
        [(900, None), (901, [1.0, 2.0]), (902, [0.0] * 64)],
        "vec_id bigint, embedding array<double>",
    )
    kept2, delta2 = embedding_dedup_incremental(weird, ledger)
    assert kept2.count() == 3
    assert delta2.count() == 0


def test_embedding_incremental_ledger_probe_broadcasts_batch(
    spark, emb_small
):
    """Scale contract: the ledger side streams; the batch probe is the
    broadcast side (no shuffle of ledger rows to find candidates)."""
    from sparkall_spark.operators.dedup import (
        embedding_ledger_table,
        _emb_verified_hits,
    )

    corpus = emb_small.filter(F.col("vec_id") < 40)
    ledger = embedding_ledger_table(corpus)
    probe = embedding_ledger_table(
        emb_small.filter(F.col("vec_id") >= 40)
    ).select(
        F.col("vec_id").alias("__bid"),
        F.col("bkts").alias("__bb"),
        F.col("qvec").alias("__bq"),
    )
    hits = _emb_verified_hits(probe, ledger, 0.99)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
