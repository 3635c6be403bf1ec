"""Benchmark decontamination: DuckDB oracle + plan shape + edge cases."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.decontam import ngram_decontaminate, ngrams

N = 5


def _duck_grams_cte(table: str, n: int) -> str:
    """CTE body producing (doc_id, gram) distinct rows for a table."""
    return f"""
    SELECT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - {n - 1}, 0) + 1),
                   i -> array_to_string(t[i:i+{n - 1}], ' ')))) AS gram
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> x <> '') AS t
            FROM {table}
        )
        WHERE len(t) >= {n}
    )
    """


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def bench(docs):
    # a deterministic slice of the corpus plays the benchmark: real
    # overlap exists (synthetic documents share templated sentences)
    return docs.filter(F.col("doc_id") % 17 == 0).select("doc_id", "text")


def test_annotate_matches_duckdb_oracle(spark, duck, docs, bench):
    out = ngram_decontaminate(
        docs, bench, n=N, min_hits=1, mode="annotate"
    ).select("doc_id", "n_hits", "contaminated")
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"]) for r in out.collect()}

    oracle = duck.execute(
        f"""
        WITH bench_docs AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0
        ),
        bgrams AS (SELECT DISTINCT gram FROM ({_duck_grams_cte('bench_docs', N)})),
        dgrams AS ({_duck_grams_cte('documents', N)}),
        hits AS (
            SELECT doc_id, count(*) AS n_hits
            FROM dgrams JOIN bgrams USING (gram)
            GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        """
    ).fetchall()
    want = {doc_id: (n_hits, n_hits >= 1) for doc_id, n_hits in oracle}
    assert got == want
    # the benchmark slice itself must be fully self-contaminated
    # (every bench doc with >= N tokens shares all its grams)
    bench_ids = {r["doc_id"] for r in bench.collect()}
    long_enough = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", F.size(ngrams("text", N)).alias("g")
        ).collect()
        if r["g"] > 0
    }
    for b in bench_ids & long_enough:
        assert got[b][1] is True


def test_clean_drops_exactly_contaminated(spark, docs, bench):
    ann = ngram_decontaminate(docs, bench, n=N, min_hits=2, mode="annotate")
    dirty = {r["doc_id"] for r in ann.filter("contaminated").collect()}
    clean = ngram_decontaminate(docs, bench, n=N, min_hits=2, mode="clean")
    kept = {r["doc_id"] for r in clean.collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == all_ids - dirty
    assert clean.columns == docs.columns  # original schema, no annotations


def test_planted_contamination_exact_hits(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "alpha beta gamma delta epsilon DIFFERENT"),
            (4, "short text"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "ALPHA BETA GAMMA DELTA EPSILON")], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r["n_hits"]
        for r in ngram_decontaminate(docs, bench, n=5).collect()
    }
    # bench has exactly one 5-gram (lowercased); doc1 and doc3 contain it
    assert out == {1: 1, 2: 0, 3: 1, 4: 0}


def test_short_docs_yield_empty_not_null(spark):
    df = spark.createDataFrame([("a b",), ("",), ("   ",)], "text string")
    rows = df.select(F.size(ngrams("text", 3)).alias("s")).collect()
    assert [r["s"] for r in rows] == [0, 0, 0]


def test_plan_no_corpus_shuffle_before_join(docs, bench):
    """The corpus side must reach the gram join via map-side explode +
    BroadcastHashJoin — an Exchange before the join would shuffle the
    exploded corpus (catastrophic at 100 TB); the only exchange allowed
    below the final annotate join is the matched-gram groupBy.  No
    Python UDF may appear anywhere."""
    out = ngram_decontaminate(docs, bench, n=N)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan  # both joins must broadcast
    # exactly ONE hash-partitioned exchange in the whole plan: the
    # matched-gram groupBy (corpus-size-independent); every other
    # exchange must be a broadcast
    shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) <= 2, shuffles  # partial+final agg pair max


# ---- fuzzy (MinHash) decontamination ------------------------------------

def test_minhash_decontam_planted_near_copies(spark):
    """Lightly edited copies of benchmark docs (one token changed out of
    ~30, trigram jaccard ~0.9) must be flagged; unrelated docs must not.
    Exact n-gram decontam at n=8 misses these edits when the change
    lands mid-document — the case this operator exists for."""
    from sparkall_spark.operators.decontam import minhash_decontaminate

    bench_text = " ".join(f"tok{i}" for i in range(30))
    edited = " ".join(
        f"tok{i}" if i != 15 else "CHANGED" for i in range(30)
    )
    docs = spark.createDataFrame(
        [
            (1, edited),
            (2, "completely different words " + " ".join(f"z{i}" for i in range(26))),
            (3, bench_text),  # verbatim copy
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(bench_text,)], ["text"])
    out = minhash_decontaminate(docs, bench, threshold=0.6)
    flags = {r["doc_id"]: (r["contaminated"], r["max_jaccard"])
             for r in out.collect()}
    assert flags[1][0] and flags[3][0] and not flags[2][0]
    assert flags[3][1] == 1.0
    assert 0.6 <= flags[1][1] < 1.0
    # the mid-document edit kills every overlapping 8-gram around it but
    # verbatim 8-gram runs remain on both flanks -> exact decontam also
    # fires here; at a 14-token doc an edit leaves NO intact 8-gram:
    short_b = " ".join(f"s{i}" for i in range(14))
    short_e = " ".join(f"s{i}" if i != 7 else "X" for i in range(14))
    sdocs = spark.createDataFrame([(1, short_e)], ["doc_id", "text"])
    sbench = spark.createDataFrame([(short_b,)], ["text"])
    exact = ngram_decontaminate(sdocs, sbench, n=8, mode="annotate")
    assert not exact.first()["contaminated"]
    fuzzy = minhash_decontaminate(sdocs, sbench, threshold=0.6)
    assert fuzzy.first()["contaminated"]


def test_minhash_decontam_matches_allpairs_oracle(spark, duck, docs, bench):
    """Fixture corpus vs the doc_id%17 bench slice at threshold 0.8:
    flagged set equals the exact all-pairs trigram-Jaccard oracle (at
    j>=0.8 the per-pair LSH miss probability is ~2e-4 with 16x4 bands;
    the fixture's matches are all j=1.0 self-pairs, miss ~0)."""
    from sparkall_spark.operators.decontam import minhash_decontaminate

    out = minhash_decontaminate(docs, bench, threshold=0.8, mode="annotate")
    got = {r["doc_id"] for r in out.collect() if r["contaminated"]}
    expected = {
        r[0]
        for r in duck.execute(
            """
            WITH g AS (
              SELECT doc_id,
                     list_distinct([array_to_string(tk[i:i+2], ' ')
                                    FOR i IN generate_series(1, len(tk) - 2)]) grams
              FROM (SELECT doc_id,
                           list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                       x -> x <> '') tk
                    FROM documents)
              WHERE len(tk) >= 3)
            SELECT DISTINCT c.doc_id
            FROM g c JOIN g b ON b.doc_id % 17 = 0
            WHERE len(list_intersect(c.grams, b.grams))::DOUBLE
                  / len(list_distinct(list_concat(c.grams, b.grams))) >= 0.8
            """
        ).fetchall()
    }
    assert got == expected


def test_minhash_decontam_clean_and_validation(spark, docs, bench):
    from sparkall_spark.operators.decontam import minhash_decontaminate

    ann = minhash_decontaminate(docs, bench, threshold=0.8)
    dirty = {r["doc_id"] for r in ann.collect() if r["contaminated"]}
    clean = minhash_decontaminate(docs, bench, threshold=0.8, mode="clean")
    assert {r["doc_id"] for r in clean.collect()} == {
        r["doc_id"] for r in docs.collect()
    } - dirty
    with pytest.raises(ValueError):
        minhash_decontaminate(docs, bench, mode="bogus")
    with pytest.raises(ValueError):
        minhash_decontaminate(docs, bench, num_hashes=64, bands=7)


def test_bloom_prefilter_identical_to_exact(spark, docs, bench):
    """The bloom path is a pure PREFILTER: annotate/clean outputs are
    bit-identical to the exact path (false positives die in the confirm
    join), including with the confirm join left unbroadcast — the
    huge-bench configuration."""
    from sparkall_spark.operators.decontam import ngram_decontaminate

    exact = ngram_decontaminate(docs, bench, n=N).select(
        "doc_id", "n_hits", "contaminated"
    )
    bloom = ngram_decontaminate(
        docs, bench, n=N, prefilter="bloom", broadcast_bench=False
    ).select("doc_id", "n_hits", "contaminated")
    assert sorted(exact.collect()) == sorted(bloom.collect())


def test_bloom_no_false_negatives_and_prunes(spark, docs, bench):
    """Every bench gram passes its own bitmap (no false negatives by
    construction), and the bitmap prunes the large non-matching corpus
    majority before the exact join."""
    from sparkall_spark.operators.decontam import (
        _gram_rows,
        bloom_bitmap,
        bloom_might_contain,
    )

    bits, k = 1 << 20, 5
    bg = _gram_rows(bench, None, "text", N, True).distinct()
    bf = bloom_bitmap(bg, "__gram", bits, k)
    might = bloom_might_contain("__gram", "__bf", bits, k)
    n_bench = bg.count()
    assert (
        bg.crossJoin(F.broadcast(bf)).filter(might).count() == n_bench
    )
    cg = _gram_rows(docs, "doc_id", "text", N, True)
    survivors = cg.crossJoin(F.broadcast(bf)).filter(might).count()
    # bench is a 1/17 slice: the bitmap must kill most foreign grams
    assert survivors < cg.count() * 0.5


def test_bloom_bitmap_empty_bench_matches_nothing(spark):
    from sparkall_spark.operators.decontam import (
        bloom_bitmap,
        bloom_might_contain,
    )

    empty = spark.createDataFrame([], "g string")
    bf = bloom_bitmap(empty, "g", 1 << 10, 3)
    probe = spark.createDataFrame([("a",), ("b",)], ["g"])
    assert (
        probe.crossJoin(F.broadcast(bf))
        .filter(bloom_might_contain("g", "__bf", 1 << 10, 3))
        .count()
        == 0
    )


def test_bloom_might_contain_awkward_column_names(spark):
    """ADVICE r6: the predicate must be built from Column objects so
    names needing backticks (dots, spaces, reserved words) resolve as
    DataFrame columns rather than breaking F.expr parsing."""
    from sparkall_spark.operators.decontam import (
        bloom_bitmap,
        bloom_might_contain,
    )

    vals = spark.createDataFrame([("x",), ("y",)], ["v"])
    bf = bloom_bitmap(vals, "v", 1 << 10, 3)
    probe = (
        spark.createDataFrame([("x",), ("z",)], ["v"])
        .withColumnRenamed("v", "the gram.col")
        .crossJoin(F.broadcast(bf.withColumnRenamed("__bf", "select")))
    )
    got = probe.filter(
        bloom_might_contain(
            F.col("`the gram.col`"), F.col("`select`"), 1 << 10, 3
        )
    ).collect()
    assert [r["the gram.col"] for r in got] == ["x"]


def test_bloom_validation(spark, docs, bench):
    from sparkall_spark.operators.decontam import (
        bloom_bitmap,
        ngram_decontaminate,
    )

    with pytest.raises(ValueError):
        ngram_decontaminate(docs, bench, prefilter="bogus")
    with pytest.raises(ValueError):
        bloom_bitmap(docs, "text", m_bits=100, k=3)  # not a multiple of 64


def test_corpus_overlap_matches_duckdb(spark, duck, docs):
    """corpus_overlap's one-row diagnostics mirror a DuckDB computation
    over two source slices of the fixture."""
    from sparkall_spark.operators.decontam import corpus_overlap

    a = docs.filter(F.col("source") == "src0")
    b = docs.filter(F.col("source") == "src1")
    got = corpus_overlap(a, b, n=3).collect()[0].asDict()
    exp = duck.execute(
        """
        WITH d AS (
          SELECT doc_id, source,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') t
          FROM documents WHERE source IN ('src0', 'src1')),
        g AS (
          SELECT doc_id, source,
                 unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                         FOR i IN generate_series(1, len(t) - 2)])) gram
          FROM d WHERE len(t) >= 3),
        ga AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        gb AS (SELECT DISTINCT gram FROM g WHERE source = 'src1'),
        sh AS (SELECT gram FROM ga INTERSECT SELECT gram FROM gb)
        SELECT (SELECT count(*) FROM ga) n_grams_a,
               (SELECT count(*) FROM gb) n_grams_b,
               (SELECT count(*) FROM sh) n_shared,
               (SELECT count(*) FROM documents WHERE source='src0') n_docs_a,
               (SELECT count(DISTINCT doc_id) FROM g
                WHERE source='src0' AND gram IN (SELECT gram FROM sh))
                 n_docs_a_overlapping
        """
    ).df().iloc[0].to_dict()
    for k, v in exp.items():
        assert got[k] == v, (k, got[k], v)
    u = exp["n_grams_a"] + exp["n_grams_b"] - exp["n_shared"]
    assert got["gram_jaccard"] == round(exp["n_shared"] / u, 6)
    # r7: one-sided containment (Jaccard undersells skewed-size leakage)
    assert got["containment_a_in_b"] == round(
        exp["n_shared"] / exp["n_grams_a"], 6
    )
    assert got["containment_b_in_a"] == round(
        exp["n_shared"] / exp["n_grams_b"], 6
    )
    # disjoint corpora -> all-zero overlap, jaccard 0.0 (not NULL)
    empty = corpus_overlap(
        a, b.withColumn("text", F.lit("zz qq ww")), n=3
    ).collect()[0]
    assert empty["n_shared"] == 0 and empty["gram_jaccard"] == 0.0
    assert empty["containment_a_in_b"] == 0.0
    assert empty["containment_b_in_a"] == 0.0


def test_bloom_property_no_false_negatives(spark):
    """Hypothesis sweep: for random member sets and bloom parameters,
    EVERY member passes its own bitmap — the invariant the exact
    confirm join relies on."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from sparkall_spark.operators.decontam import (
        bloom_bitmap,
        bloom_might_contain,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(
            st.text(min_size=0, max_size=40), min_size=1, max_size=60
        ),
        m_words=st.sampled_from([1, 4, 64]),
        k=st.integers(min_value=1, max_value=6),
    )
    def check(vals, m_words, k):
        df = spark.createDataFrame([(v,) for v in vals], ["g"])
        bf = bloom_bitmap(df, "g", m_words * 64, k)
        passed = (
            df.crossJoin(F.broadcast(bf))
            .filter(bloom_might_contain("g", "__bf", m_words * 64, k))
            .count()
        )
        assert passed == df.count()

    check()


def test_pipeline_published_filter_knobs(spark, docs):
    """prepare_documents' gopher_quality / c4_rules knobs match the
    standalone predicates applied in the documented order."""
    from sparkall_spark.functions import text as X
    from sparkall_spark.operators.pipeline import prepare_documents

    out = prepare_documents(docs, min_quality=0.0, gopher_quality=True)
    expected = docs.filter(X.gopher_quality_keep("text"))
    assert out.count() == expected.select("doc_id").distinct().count()

    # c4: fixture docs have no terminal punctuation, so every doc fails
    # the min-sentences rule and the corpus empties — the degenerate
    # case should behave, not explode
    assert prepare_documents(docs, min_quality=0.0, c4_rules=True).count() == 0


def _emb_fixture(spark):
    import math

    rows = []
    for i in range(40):
        a = 2 * math.pi * i / 40
        rows.append((i, [math.cos(a), math.sin(a), 0.5]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_decontaminate_annotate_and_clean(spark):
    from pyspark.sql import functions as F

    from sparkall_spark.operators.decontam import embedding_decontaminate

    docs = _emb_fixture(spark)
    # bench = scaled copies of vectors 0 and 10 (cosine exactly 1.0;
    # neighboring fixture vectors are 9 degrees apart, cosine ~0.990)
    bench = docs.filter(F.col("vec_id").isin(0, 10)).select(
        F.transform("embedding", lambda x: x * 2.0).alias("embedding")
    )
    ann = embedding_decontaminate(docs, bench, threshold=0.9999)
    hit = {r["vec_id"]: r for r in ann.filter("contaminated").collect()}
    assert set(hit) == {0, 10}
    assert all(r["n_bench_matches"] == 1 for r in hit.values())
    assert all(r["max_cosine"] == 1.0 for r in hit.values())
    clean = embedding_decontaminate(
        docs, bench, threshold=0.9999, mode="clean"
    )
    assert clean.count() == 38
    assert clean.columns == docs.columns

    # the bench side must enter the plan as a broadcast: corpus data
    # never shuffles for the scan
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_embedding_decontaminate_zero_vectors_never_match(spark):
    from sparkall_spark.operators.decontam import embedding_decontaminate

    docs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [([0.0, 0.0],), ([1.0, 0.0],)], "embedding array<double>"
    )
    ann = embedding_decontaminate(docs, bench, threshold=0.5)
    rows = {r["vec_id"]: r["contaminated"] for r in ann.collect()}
    assert rows == {1: False, 2: True}


def test_embedding_decontaminate_validates_mode(spark):
    from sparkall_spark.operators.decontam import embedding_decontaminate

    docs = _emb_fixture(spark)
    with pytest.raises(ValueError, match="annotate"):
        embedding_decontaminate(docs, docs, mode="nope")


# --- sketch-driven scheduling gate (r9) -------------------------------------


def test_corpus_overlap_gate_estimates(spark):
    from sparkall_spark.operators.pipeline import corpus_overlap_gate

    a = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id long, text string",
    )
    same = corpus_overlap_gate(a, a, min_jaccard=0.5)
    assert same["run"] and same["jaccard_est"] == 1.0
    b = spark.createDataFrame([(9, "zeta eta theta")], "doc_id long, text string")
    disjoint = corpus_overlap_gate(a, b, min_jaccard=0.01)
    assert not disjoint["run"] and disjoint["jaccard_est"] == 0.0
    # empty side: nothing to find, never schedules above a threshold
    empty = corpus_overlap_gate(a, b.limit(0), min_jaccard=0.01)
    assert not empty["run"]


def test_fuzzy_decontam_pass_scheduled_by_overlap_gate(spark):
    """The KMV overlap estimate must be LOAD-BEARING: the same planted
    near-dup contamination is dropped when the gate schedules the
    fuzzy pass and survives when the estimate says skip."""
    from sparkall_spark.operators.pipeline import prepare_documents

    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string"
    )
    # doc 1 is a verbatim bench copy (5 tokens -> NO 8-grams, so the
    # exact n-gram pass can't drop it; only the fuzzy pass can); the
    # rest dilute the corpus-vs-bench vocabulary jaccard to 5/25 = 0.2
    rows = [(1, "alpha beta gamma delta epsilon")] + [
        (i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(2, 7)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(
        min_quality=0.0,
        decontam_bench=bench,
        decontam_fuzzy=True,
        decontam_fuzzy_threshold=0.9,
    )
    dropped = prepare_documents(corpus, **kw)
    assert sorted(r["doc_id"] for r in dropped.collect()) == [2, 3, 4, 5, 6]
    ran = prepare_documents(corpus, decontam_fuzzy_gate_min_jaccard=0.1, **kw)
    assert sorted(r["doc_id"] for r in ran.collect()) == [2, 3, 4, 5, 6]
    skipped = prepare_documents(
        corpus, decontam_fuzzy_gate_min_jaccard=0.5, **kw
    )
    assert sorted(r["doc_id"] for r in skipped.collect()) == [1, 2, 3, 4, 5, 6]
