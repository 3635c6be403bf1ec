"""Positional inverted index + phrase search (operators/postings.py):
DuckDB mirror equality on the fixture corpus, positional-adjacency
semantics, overlapping matches, and the decontamination composition."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.postings import (
    build_postings,
    phrase_decontaminate,
    phrase_search,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The quick brown FOX"),
        (3, "quick quick quick"),
        (4, "brown the quick"),
        (5, ""),
        (6, "aa aa aa aa"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_match_duckdb_mirror(spark, duck, sf_dir):
    got = {
        (r["token"], r["doc_id"]): (list(r["positions"]), r["tf"])
        for r in build_postings(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        )
        .filter(F.col("token").startswith("a"))
        .collect()
    }
    want = {
        (r[0], r[1]): (list(r[2]), r[3])
        for r in duck.execute(
            """
            WITH d AS (
              SELECT doc_id, list_filter(
                  regexp_split_to_array(lower(text), '\\s+'),
                  x -> x <> '') AS ts
              FROM documents),
            tok AS (
              SELECT doc_id, unnest(ts) AS token,
                     unnest(range(len(ts))) AS pos
              FROM d)
            SELECT token, doc_id,
                   list_sort(list(pos)) AS positions,
                   count(*)::BIGINT AS tf
            FROM tok WHERE token LIKE 'a%'
            GROUP BY token, doc_id
            """
        ).fetchall()
    }
    assert got == want


def test_phrase_search_positions(spark):
    post = build_postings(_docs(spark))
    hits = {
        r["doc_id"]: (list(r["match_positions"]), r["n_matches"])
        for r in phrase_search(post, "the quick brown").collect()
    }
    assert hits == {1: ([0], 1), 2: ([0], 1)}  # case-folded; doc 4 is
    # 'brown the quick' — same tokens, wrong order: must NOT match


def test_phrase_search_overlapping_and_single(spark):
    post = build_postings(_docs(spark))
    hits = {
        r["doc_id"]: list(r["match_positions"])
        for r in phrase_search(post, "aa aa").collect()
    }
    assert hits == {6: [0, 1, 2]}  # overlapping starts all reported
    single = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(post, "quick").collect()
    }
    assert single == {1: 1, 2: 1, 3: 3, 4: 1}
    with pytest.raises(ValueError, match="at least one token"):
        phrase_search(post, "   ")


def test_phrase_decontaminate_modes(spark):
    docs = _docs(spark)
    ann = phrase_decontaminate(docs, ["the quick brown", "aa aa"])
    got = {r["doc_id"]: r["n_phrase_hits"] for r in ann.collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 3}
    clean = phrase_decontaminate(
        docs, ["the quick brown", "aa aa"], mode="clean"
    )
    assert sorted(r["doc_id"] for r in clean.collect()) == [3, 4, 5]
    with pytest.raises(ValueError, match="non-empty"):
        phrase_decontaminate(docs, [])


def test_postings_plan_is_udf_free(spark):
    plan = (
        build_postings(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_matches_reference_computation(spark):
    import math

    from sparkall_spark.operators.postings import bm25_scores

    docs = _docs(spark)
    post = build_postings(docs)
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(post, "quick dog").collect()
    }
    # reference BM25 computed straight from the formula
    corpus = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox",
        3: "quick quick quick",
        4: "brown the quick",
        6: "aa aa aa aa",
    }
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(toks)
    avg = sum(len(t) for t in toks.values()) / n
    want = {}
    for term in ("quick", "dog"):
        df = sum(term in t for t in toks.values())
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if not tf:
                continue
            s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(t) / avg))
            want[d] = want.get(d, 0.0) + s
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-6, d
    # ranking sanity: doc 1 (quick AND rare 'dog') outranks pure-quick
    assert got[1] == max(got.values())


def test_bm25_accepts_precomputed_stats_and_validates(spark):
    from sparkall_spark.operators.postings import bm25_scores

    post = build_postings(_docs(spark))
    a = {r["doc_id"]: r["bm25"] for r in bm25_scores(post, "brown").collect()}
    b = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(post, "brown", n_docs=5, avg_len=4.6).collect()
    }
    assert a == b  # the fixture's true stats, passed explicitly
    with pytest.raises(ValueError, match="at least one token"):
        bm25_scores(post, "")


# --- saved (partition-pruned) index ----------------------------------------


def test_token_bucket_python_twin_matches_column(spark):
    from sparkall_spark.operators.postings import (
        _token_bucket_col,
        token_bucket,
    )

    toks = ["the", "quick", "aa", "hash", "table", "scan", "x", "", "Zebra9"]
    for nb, seed in ((8, 0), (64, 0), (64, 3)):
        got = (
            spark.createDataFrame([(t,) for t in toks], "token string")
            .select("token", _token_bucket_col(F.col("token"), nb, seed).alias("b"))
            .collect()
        )
        for r in got:
            assert r["b"] == token_bucket(r["token"], nb, seed), (
                r["token"], nb, seed,
            )


def test_saved_index_roundtrip_and_meta(spark, tmp_path):
    from sparkall_spark.operators.postings import (
        bm25_scores,
        load_doclen,
        load_postings,
        read_postings_meta,
        save_postings,
    )

    docs = _docs(spark)
    post = build_postings(docs)
    path = str(tmp_path / "idx")
    save_postings(post, path, n_buckets=8)
    meta = read_postings_meta(spark, path)
    assert meta["n_buckets"] == 8 and meta["seed"] == 0
    assert meta["n_docs"] == 5  # doc 5 is empty -> no postings
    assert abs(meta["avg_len"] - 23 / 5) < 1e-12
    saved = load_postings(spark, path)
    # the hidden _doclen/_meta subdirs must NOT leak into the main scan
    assert saved.count() == post.count()
    assert "tok_bucket" in saved.columns
    # phrase results identical through the saved pruned path
    mem = {
        r["doc_id"]: (list(r["match_positions"]), r["n_matches"])
        for r in phrase_search(post, "the quick brown").collect()
    }
    prn = {
        r["doc_id"]: (list(r["match_positions"]), r["n_matches"])
        for r in phrase_search(
            saved, "the quick brown", n_buckets=8
        ).collect()
    }
    assert mem == prn == {1: ([0], 1), 2: ([0], 1)}
    # bm25 identical with saved doclen + meta stats (zero index rescans)
    a = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(post, "quick dog").collect()
    }
    b = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            saved,
            "quick dog",
            n_docs=meta["n_docs"],
            avg_len=meta["avg_len"],
            doclen=load_doclen(spark, path),
            n_buckets=8,
        ).collect()
    }
    assert a == b


def test_saved_index_lookup_is_partition_pruned(spark, tmp_path):
    """The r8 docstring claim, now plan-asserted (r9 VERDICT ask #1):
    a phrase lookup against the saved index must carry the literal
    tok_bucket equality as a PartitionFilter (directory pruning at
    planning time) AND push the token equality into the parquet scan
    (PushedFilters) — i.e. the executed plan reads one bucket's
    directory, not the index."""
    from sparkall_spark.operators.postings import (
        load_postings,
        save_postings,
        token_bucket,
    )

    post = build_postings(_docs(spark))
    path = str(tmp_path / "idx")
    save_postings(post, path, n_buckets=8)
    saved = load_postings(spark, path)
    out = phrase_search(saved, "quick", n_buckets=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    b = token_bucket("quick", 8)
    scans = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scans, f"no partitioned scan in plan:\n{plan[:2000]}"
    pruned = [
        ln
        for ln in scans
        if f"tok_bucket = {b}" in ln or f"(tok_bucket#" in ln
    ]
    assert any(f"= {b})" in ln for ln in pruned), (
        "bucket literal missing from PartitionFilters — lookup would "
        f"scan the whole index:\n{scans}"
    )
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(token,quick)" in ln for ln in pushed), (
        f"token equality not pushed to parquet:\n{pushed}"
    )


def test_bm25_empty_postings_raises(spark):
    from sparkall_spark.operators.postings import bm25_scores

    empty = build_postings(
        spark.createDataFrame([], "doc_id long, text string")
    )
    with pytest.raises(ValueError, match="empty postings"):
        bm25_scores(empty, "quick")


def test_append_postings_equals_full_rebuild(spark, tmp_path):
    """Index maintenance: appending a new batch's postings to a saved
    index must answer every query exactly like an index rebuilt from
    scratch over the union — same postings rows, same meta stats, and
    the appended rows land in the SAVED layout's buckets (pruning
    still holds)."""
    from sparkall_spark.operators.postings import (
        append_postings,
        bm25_scores,
        load_doclen,
        load_postings,
        read_postings_meta,
        save_postings,
        token_bucket,
    )

    docs = _docs(spark)
    batch_a = docs.filter("doc_id <= 3")
    batch_b = docs.filter("doc_id > 3")
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    save_postings(build_postings(batch_a), inc, n_buckets=8)
    append_postings(build_postings(batch_b), inc)
    save_postings(build_postings(docs), full, n_buckets=8)
    # identical postings row sets (incl. the bucket column)
    key = lambda r: (r["token"], r["doc_id"], tuple(r["positions"]), r["tf"], r["tok_bucket"])
    assert sorted(map(key, load_postings(spark, inc).collect())) == sorted(
        map(key, load_postings(spark, full).collect())
    )
    # identical meta + doclen
    mi, mf = read_postings_meta(spark, inc), read_postings_meta(spark, full)
    assert mi == mf
    assert sorted(map(tuple, load_doclen(spark, inc).collect())) == sorted(
        map(tuple, load_doclen(spark, full).collect())
    )
    # queries through the appended index: pruned AND correct
    saved = load_postings(spark, inc)
    hits = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(saved, "aa aa", n_buckets=8).collect()
    }
    assert hits == {6: 3}  # doc 6 arrived via the APPEND
    out = phrase_search(saved, "quick", n_buckets=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    b = token_bucket("quick", 8)
    assert any(
        "PartitionFilters" in ln and f"= {b})" in ln
        for ln in plan.splitlines()
    )
    a = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            saved, "quick dog",
            n_docs=mi["n_docs"], avg_len=mi["avg_len"],
            doclen=load_doclen(spark, inc), n_buckets=8,
        ).collect()
    }
    want = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(build_postings(docs), "quick dog").collect()
    }
    assert a == want


def test_compact_postings_restores_file_counts(spark, tmp_path):
    """append -> compact must be indistinguishable from a fresh rebuild
    (rows, meta, doclen, pruned query answers) while bringing every
    bucket directory back to exactly one data file."""
    import os

    from sparkall_spark.operators.postings import (
        append_postings,
        compact_postings,
        load_doclen,
        load_postings,
        read_postings_meta,
        save_postings,
        token_bucket,
    )

    docs = _docs(spark)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    save_postings(build_postings(docs.filter("doc_id <= 2")), inc,
                  n_buckets=8)
    append_postings(build_postings(docs.filter("doc_id in (3, 4)")), inc)
    append_postings(build_postings(docs.filter("doc_id > 4")), inc)
    save_postings(build_postings(docs), full, n_buckets=8)

    def data_files(d):
        return [
            os.path.join(root, f)
            for root, _dirs, files in os.walk(d)
            for f in files
            if f.endswith(".parquet") and "_compact_tmp" not in root
        ]

    def bucket_files(d):
        out = {}
        for f in data_files(d):
            part = [p for p in f.split(os.sep) if p.startswith("tok_bucket=")]
            if part:
                out.setdefault(part[0], []).append(f)
        return out

    # two appends really did grow per-bucket file counts
    assert any(len(v) > 1 for v in bucket_files(inc).values())
    key = lambda r: (r["token"], r["doc_id"], tuple(r["positions"]),
                     r["tf"], r["tok_bucket"])
    before = sorted(map(key, load_postings(spark, inc).collect()))

    compact_postings(spark, inc)

    # one data file per bucket dir, staging gone, doclen re-bounded
    bf = bucket_files(inc)
    assert bf and all(len(v) == 1 for v in bf.values()), bf
    assert not os.path.exists(os.path.join(inc, "_compact_tmp"))
    doclen_files = [
        f for root, _d, files in os.walk(os.path.join(inc, "_doclen"))
        for f in files if f.endswith(".parquet")
    ]
    assert 0 < len(doclen_files) <= 8  # n_buckets bounds the rewrite
    # rows unchanged and equal to the fresh rebuild
    after = sorted(map(key, load_postings(spark, inc).collect()))
    assert after == before
    assert after == sorted(map(key, load_postings(spark, full).collect()))
    # meta + doclen equal to the fresh rebuild; doclen back to one write
    mi, mf = read_postings_meta(spark, inc), read_postings_meta(spark, full)
    assert mi == mf
    assert sorted(map(tuple, load_doclen(spark, inc).collect())) == sorted(
        map(tuple, load_doclen(spark, full).collect())
    )
    # pruned query answers survive the rewrite, PartitionFilters intact
    saved = load_postings(spark, inc)
    out = phrase_search(saved, "quick", n_buckets=8)
    got = {r["doc_id"]: r["n_matches"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    b = token_bucket("quick", 8)
    assert any(
        "PartitionFilters" in ln and f"= {b})" in ln
        for ln in plan.splitlines()
    )


def test_phrase_decontaminate_via_saved_index(spark, tmp_path):
    from sparkall_spark.operators.postings import (
        load_postings,
        phrase_decontaminate,
        save_postings,
    )

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    save_postings(build_postings(docs), path, n_buckets=8)
    saved = load_postings(spark, path)
    fresh = phrase_decontaminate(docs, ["the quick brown", "aa aa"])
    via_idx = phrase_decontaminate(
        docs, ["the quick brown", "aa aa"],
        postings=saved, n_buckets=8,
    )
    assert sorted(map(tuple, fresh.collect())) == sorted(
        map(tuple, via_idx.collect())
    )


def test_term_query_and_or_modes(spark, duck, sf_dir):
    from sparkall_spark.operators.postings import build_postings, term_query

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = build_postings(docs)
    got_and = {
        r["doc_id"]: (r["n_terms_matched"], r["total_tf"])
        for r in term_query(idx, ["hash", "table"], mode="and").collect()
    }
    got_or = {
        r["doc_id"]: (r["n_terms_matched"], r["total_tf"])
        for r in term_query(idx, ["hash", "table"], mode="or").collect()
    }
    mirror = {
        d: (n, t)
        for d, n, t in duck.execute(
            """
            WITH tf AS (
              SELECT doc_id, tok, count(*)::BIGINT AS tf
              FROM (SELECT doc_id, unnest(list_filter(
                      regexp_split_to_array(lower(text), '\\s+'),
                      x -> x <> '')) AS tok
                    FROM documents)
              WHERE tok IN ('hash', 'table') GROUP BY 1, 2)
            SELECT doc_id, count(*)::INT, sum(tf)::BIGINT
            FROM tf GROUP BY doc_id
            """
        ).fetchall()
    }
    assert got_or == mirror
    assert got_and == {d: v for d, v in mirror.items() if v[0] == 2}
    assert got_and and got_or and len(got_and) < len(got_or)
    # duplicate terms collapse to one (a term cannot match twice)
    dup = {
        r["doc_id"]: r["n_terms_matched"]
        for r in term_query(idx, ["hash", "HASH"], mode="and").collect()
    }
    assert dup and all(v == 1 for v in dup.values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode"):
        term_query(idx, ["x"], mode="xor")
    with _pytest.raises(ValueError, match="non-empty"):
        term_query(idx, ["", "  "])


def test_term_query_saved_index_is_pruned(spark, tmp_path, sf_dir):
    from sparkall_spark.operators.postings import (
        build_postings,
        load_postings,
        save_postings,
        term_query,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "idx")
    save_postings(build_postings(docs), path, n_buckets=8)
    saved = load_postings(spark, path)
    q = term_query(saved, ["hash", "scan"], mode="and", n_buckets=8)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # every scan carries a tok_bucket partition filter: pruned lookups
    assert "PartitionFilters: [isnotnull(tok_bucket" in plan
    assert q.count() > 0


def test_bucketed_build_one_exchange_and_prebucketed_write(spark, tmp_path):
    """r13 (guide §2.3/§6): build_postings(n_buckets=...) shuffles the
    exploded tokens ONCE on tok_bucket and aggregates in place (the
    hash partitioning on the bucket — a pure function of the token —
    already satisfies the aggregation's clustering requirement, so the
    plan holds exactly one Exchange), and save/append with
    prebucketed=True skip the writer's full-data repartition while
    producing an index identical to the plain path: same rows, same
    meta/doclen, same one-file-per-bucket layout, pruning intact."""
    import glob

    from sparkall_spark.operators.postings import (
        append_postings,
        load_doclen,
        load_postings,
        read_postings_meta,
        save_postings,
        token_bucket,
    )

    docs = _docs(spark)
    b = build_postings(docs, n_buckets=8)
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    ex_line = plan.split("Exchange hashpartitioning", 1)[1].splitlines()[0]
    assert "tok_bucket" in ex_line, ex_line
    # rows identical to the plain build, bucket values in lockstep
    # with the driver-side twin
    got = sorted(
        (r["token"], r["doc_id"], tuple(r["positions"]), r["tf"],
         r["tok_bucket"])
        for r in b.collect()
    )
    want = sorted(
        (r["token"], r["doc_id"], tuple(r["positions"]), r["tf"],
         token_bucket(r["token"], 8))
        for r in build_postings(docs).collect()
    )
    assert got == want

    # prebucketed save+append == plain save+append, end to end
    batch_a, batch_b = docs.filter("doc_id <= 3"), docs.filter("doc_id > 3")
    plain_d, pre_d = str(tmp_path / "plain"), str(tmp_path / "pre")
    save_postings(build_postings(batch_a), plain_d, n_buckets=8)
    append_postings(build_postings(batch_b), plain_d)
    save_postings(
        build_postings(batch_a, n_buckets=8), pre_d,
        n_buckets=8, prebucketed=True,
    )
    append_postings(
        build_postings(batch_b, n_buckets=8), pre_d, prebucketed=True
    )
    key = lambda r: (r["token"], r["doc_id"], tuple(r["positions"]),
                     r["tf"], r["tok_bucket"])
    assert sorted(map(key, load_postings(spark, pre_d).collect())) == sorted(
        map(key, load_postings(spark, plain_d).collect())
    )
    assert read_postings_meta(spark, pre_d) == read_postings_meta(
        spark, plain_d
    )
    assert sorted(map(tuple, load_doclen(spark, pre_d).collect())) == sorted(
        map(tuple, load_doclen(spark, plain_d).collect())
    )
    # same file-count budget: one file per touched bucket per write
    for d in (plain_d, pre_d):
        per_bucket: dict[str, int] = {}
        for f in glob.glob(f"{d}/tok_bucket=*/*.parquet"):
            k = f.rsplit("/", 2)[-2]
            per_bucket[k] = per_bucket.get(k, 0) + 1
        assert per_bucket and all(v <= 2 for v in per_bucket.values()), (
            d, per_bucket,
        )
    # pruned lookup still carries the PartitionFilter
    saved = load_postings(spark, pre_d)
    out = phrase_search(saved, "quick", n_buckets=8)
    out.collect()
    xplan = out._jdf.queryExecution().executedPlan().toString()
    bkt = token_bucket("quick", 8)
    assert any(
        "PartitionFilters" in ln and f"= {bkt})" in ln
        for ln in xplan.splitlines()
    )


def test_compact_resumes_crashed_swap_from_staged_snapshot(spark, tmp_path):
    """r13 (r12 advice): a compaction that crashed MID-SWAP leaves a
    completed staging (_SUCCESS) and possibly a live bucket that was
    deleted but not yet renamed-in.  Re-running compact_postings must
    FINISH the swap from the staged snapshot — restaging from the
    now-incomplete live set would overwrite the only full copy of the
    missing bucket's rows.  A staging WITHOUT _SUCCESS (crash during
    the staging write) must be discarded and restaged normally."""
    import glob
    import shutil

    from sparkall_spark.operators.postings import (
        _COMPACT_SUBDIR,
        _token_bucket_col,
        compact_postings,
        load_postings,
        save_postings,
    )

    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    save_postings(build_postings(docs), idx, n_buckets=8)
    want = sorted(
        (r["token"], r["doc_id"], tuple(r["positions"]), r["tf"],
         r["tok_bucket"])
        for r in load_postings(spark, idx).collect()
    )

    # fabricate the crashed-mid-swap state exactly as compact stages it
    staging = f"{idx}/{_COMPACT_SUBDIR}"
    load_postings(spark, idx).drop("tok_bucket").withColumn(
        "tok_bucket", _token_bucket_col(F.col("token"), 8, 0)
    ).repartition(8, "tok_bucket").write.mode("overwrite").partitionBy(
        "tok_bucket"
    ).parquet(f"{staging}/postings")
    victim = sorted(glob.glob(f"{idx}/tok_bucket=*"))[0]
    shutil.rmtree(victim)  # deleted live dir, crash before rename
    assert sorted(
        (r["token"], r["doc_id"], tuple(r["positions"]), r["tf"],
         r["tok_bucket"])
        for r in load_postings(spark, idx).collect()
    ) != want  # the live tree really is missing rows now

    compact_postings(spark, idx)  # must resume, not restage
    got = sorted(
        (r["token"], r["doc_id"], tuple(r["positions"]), r["tf"],
         r["tok_bucket"])
        for r in load_postings(spark, idx).collect()
    )
    assert got == want
    assert not glob.glob(f"{idx}/{_COMPACT_SUBDIR}")  # staging cleaned

    # incomplete staging (no _SUCCESS): discarded, normal compaction
    load_postings(spark, idx).drop("tok_bucket").withColumn(
        "tok_bucket", _token_bucket_col(F.col("token"), 8, 0)
    ).repartition(8, "tok_bucket").write.mode("overwrite").partitionBy(
        "tok_bucket"
    ).parquet(f"{staging}/postings")
    import os

    os.remove(f"{staging}/postings/_SUCCESS")
    compact_postings(spark, idx)
    got2 = sorted(
        (r["token"], r["doc_id"], tuple(r["positions"]), r["tf"],
         r["tok_bucket"])
        for r in load_postings(spark, idx).collect()
    )
    assert got2 == want
    # post-compact invariant holds: one data file per bucket dir
    for d in glob.glob(f"{idx}/tok_bucket=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1
