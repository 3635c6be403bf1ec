"""Deterministic sampling / splitting / packing (operators/sampling.py).

The portability contract is the point: every assignment must reproduce
bit-for-bit in DuckDB via the *_sql mirrors (same two-LCG-rounds-mod-
prime arithmetic), so splits survive engine changes and downstream
systems can recompute them.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators import sampling as S

CUST = "/root/testdata/sf0.001/customer.parquet"
DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def cust(spark):
    return spark.read.parquet(CUST)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{CUST}'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con


def test_hash_split_matches_sql_mirror(cust):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = S.hash_split(cust, "c_custkey", weights, seed=7)
    got = {
        r["c_custkey"]: r["split"]
        for r in out.select("c_custkey", "split").collect()
    }
    con = _duck()
    mirror = con.execute(
        "SELECT c_custkey, "
        + S.hash_split_sql("c_custkey", weights, seed=7)
        + " AS split FROM customer"
    ).fetchall()
    con.close()
    assert dict(mirror) == got
    # complete + deterministic + all splits used at n=150
    assert len(got) == cust.count()
    assert set(got.values()) == {"train", "val", "test"}
    again = {
        r["c_custkey"]: r["split"]
        for r in S.hash_split(cust, "c_custkey", weights, seed=7)
        .select("c_custkey", "split")
        .collect()
    }
    assert again == got
    # a different seed reshuffles membership
    other = {
        r["c_custkey"]: r["split"]
        for r in S.hash_split(cust, "c_custkey", weights, seed=8)
        .select("c_custkey", "split")
        .collect()
    }
    assert other != got


def test_hash_split_weight_validation(cust):
    with pytest.raises(ValueError, match="sum to 1"):
        S.hash_split(cust, "c_custkey", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="fraction"):
        S.fraction_sample(cust, "c_custkey", 1.5)


def test_hash_split_is_map_only(cust):
    """Split assignment must not shuffle: no Exchange in the plan."""
    out = S.hash_split(cust, "c_custkey", {"a": 0.5, "b": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fraction_sample_stability(cust):
    """Growing the corpus never moves an existing row (the property
    DataFrame.sample does NOT have)."""
    half = cust.filter(F.col("c_custkey") <= 75)
    picked_half = {
        r["c_custkey"]
        for r in S.fraction_sample(half, "c_custkey", 0.3, seed=3).collect()
    }
    picked_full = {
        r["c_custkey"]
        for r in S.fraction_sample(cust, "c_custkey", 0.3, seed=3).collect()
    }
    assert picked_half == {k for k in picked_full if k <= 75}
    assert 0 < len(picked_full) < cust.count()


def test_stratified_sample_exact_k(cust):
    out = S.stratified_sample(cust, "c_mktsegment", 5, "c_custkey", seed=1)
    counts = {
        r["c_mktsegment"]: r["n"]
        for r in out.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["c_mktsegment"]: r["n"]
        for r in cust.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {k: min(5, v) for k, v in sizes.items()}
    # deterministic pick, mirrored in SQL (row_number over mixed hash)
    con = _duck()
    mirror = con.execute(
        f"""
        SELECT c_custkey FROM (
            SELECT c_custkey,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY {S.mix_sql('c_custkey', 1)}, c_custkey
                   ) AS rn
            FROM customer
        ) WHERE rn <= 5
        """
    ).fetchall()
    con.close()
    assert {r[0] for r in mirror} == {
        r["c_custkey"] for r in out.select("c_custkey").collect()
    }


def test_pack_sequences_matches_sql_and_conserves_tokens(spark, docs):
    d = docs.withColumn(
        "n_tokens", F.size(F.split(F.col("text"), r"\s+"))
    ).select("doc_id", "n_tokens")
    out = S.pack_sequences(d, "doc_id", "n_tokens", ctx_len=512, n_shards=4, seed=5)
    rows = out.select("doc_id", "shard", "start_offset", "seq_id").collect()
    got = {r["doc_id"]: (r["shard"], r["start_offset"], r["seq_id"]) for r in rows}

    con = _duck()
    mix = S.mix_sql("doc_id", 5)
    mirror = con.execute(
        f"""
        WITH d AS (
            SELECT doc_id,
                   len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
                   ({mix}) % 4 AS shard, ({mix}) AS mixed
            FROM documents
        )
        SELECT doc_id, shard,
               sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY mixed, doc_id
               ) - n_tokens AS start_offset
        FROM d
        """
    ).fetchall()
    con.close()
    for doc_id, shard, start in mirror:
        g = got[doc_id]
        assert g[0] == shard and g[1] == start
        assert g[2] == start // 512

    # stream conservation per shard: offsets tile the token stream
    # exactly (no gaps, no overlaps)
    import collections

    by_shard = collections.defaultdict(list)
    tok = {
        r["doc_id"]: r["n_tokens"]
        for r in d.collect()
    }
    for doc_id, (shard, start, _seq) in got.items():
        by_shard[shard].append((start, tok[doc_id]))
    for shard, items in by_shard.items():
        items.sort()
        pos = 0
        for start, n in items:
            assert start == pos
            pos += n

    # scale shape: the window partitions by shard, not globally
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan or "hashpartitioning" in plan


def test_mix_hash_portability_property(spark):
    """Property: for arbitrary int64 ids (incl. negatives and huge
    values) the Spark mix hash equals the DuckDB rendering — the
    portability contract under adversarial ids."""
    import random

    rng = random.Random(99)
    ids = (
        [0, 1, -1, 2**62, -(2**62), 2**31 - 1, -(2**31)]
        + [rng.randrange(-(2**62), 2**62) for _ in range(200)]
    )
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {
        r["id"]: r["b"]
        for r in df.select("id", S.split_bucket("id", seed=17).alias("b")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    mirror = dict(
        con.execute(
            f"SELECT id, {S.split_bucket_sql('id', seed=17)} FROM t"
        ).fetchall()
    )
    con.close()
    assert mirror == got


def test_pretrain_pipeline_v2_composition(spark):
    """The r4 operator set composes into one lazy end-to-end plan:
    corpus mixing -> quality/PII prep -> split -> packing.  Invariants:
    deterministic, splits partition the survivors, packing tiles each
    shard, no PII in the output text."""
    from pyspark.sql import functions as F

    from sparkall_spark.functions.text import token_count
    from sparkall_spark.operators.pipeline import prepare_documents
    from sparkall_spark.operators.sampling import (
        hash_split,
        mix_corpus,
        pack_sequences,
    )

    rows = []
    for i in range(400):
        src = "web" if i % 2 == 0 else "books"
        text = (
            f"document {i} from {src} with plenty of plain words to pass "
            f"quality checks and a contact mail user{i}@site.example.org"
        )
        rows.append((i, src, text))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    docs = docs.withColumn("n_tokens", token_count("text"))

    mixed = mix_corpus(
        docs, "source", "n_tokens", {"web": 0.7, "books": 0.3},
        token_budget=4000, id_col="doc_id", seed=1,
    )
    prepped = prepare_documents(mixed, min_quality=0.3, redact_pii=True)
    split = hash_split(prepped, "doc_id", {"train": 0.9, "val": 0.1}, seed=2)
    packed = pack_sequences(
        split.filter(F.col("split") == "train"),
        "doc_id", "n_tokens", ctx_len=128, n_shards=4, seed=3,
    )
    out = packed.collect()
    assert len(out) > 20
    assert all("@" not in r["text"] and "[EMAIL]" in r["text"] for r in out)
    # packing tiles each shard exactly
    import collections

    by_shard = collections.defaultdict(list)
    for r in out:
        by_shard[r["shard"]].append((r["start_offset"], r["n_tokens"]))
    for items in by_shard.values():
        pos = 0
        for start, n in sorted(items):
            assert start == pos
            pos += n
    # rerun -> identical
    again = packed.collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


# --- order_col stratified top-k (r5): per-domain quality cap --------------

def test_stratified_sample_order_col_topk(spark, duck, sf_dir):
    from tests.conftest import assert_matches_oracle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = S.stratified_sample(
        docs, "source", 5, "doc_id", order_col="n_chars", descending=True
    ).select("doc_id", "source", "n_chars")
    sql = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) q
WHERE rn <= 5
"""
    assert_matches_oracle(out, duck, sql)


def test_stratified_sample_order_col_plan_has_group_limit(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = S.stratified_sample(
        docs, "source", 3, "doc_id", order_col="n_chars"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # partial top-k before the exchange


# --- r7: temperature-scaled source mixing ----------------------------------


def test_temperature_weights_limits():
    from sparkall_spark.operators.sampling import temperature_weights

    counts = {"big": 900_000, "small": 100_000}
    natural = temperature_weights(counts, 1.0)
    assert abs(natural["big"] - 0.9) < 1e-12
    near_uniform = temperature_weights(counts, 0.01)
    assert abs(near_uniform["big"] - near_uniform["small"]) < 0.02
    # monotone: lowering alpha always shifts weight toward the small one
    prev = 0.0
    for a in (1.0, 0.7, 0.5, 0.3):
        w = temperature_weights(counts, a)["small"]
        assert w > prev
        prev = w
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_weights(counts, 0.0)
    with _pytest.raises(ValueError):
        temperature_weights({"a": 0}, 0.5)


def test_temperature_mix_is_deterministic_and_shifts_shares(spark, sf_dir):
    from sparkall_spark.operators.sampling import temperature_mix

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("n_tok", F.size(F.split(F.trim("text"), r"\s+")))
    )
    m1 = temperature_mix(docs, "source", "n_tok", 0.3, 20_000, "doc_id")
    m2 = temperature_mix(docs, "source", "n_tok", 0.3, 20_000, "doc_id")
    ids1 = {r["doc_id"] for r in m1.collect()}
    assert ids1 == {r["doc_id"] for r in m2.collect()}  # rerun-stable
    assert 0 < len(ids1) < docs.count()
    # lower temperature keeps a LARGER share of the smallest source
    stats = {
        r["source"]: r["c"]
        for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    smallest = min(stats, key=stats.get)
    def share(alpha):
        m = temperature_mix(docs, "source", "n_tok", alpha, 20_000, "doc_id")
        kept = m.filter(F.col("source") == smallest).count()
        return kept / stats[smallest]
    assert share(0.3) >= share(1.0)


def test_temperature_mix_membership_matches_sql_mirror(spark, duck, sf_dir):
    """Membership is the mix_corpus id-hash rule with thresholds from
    the Python-computed weights — the mirror uses the SAME integer
    thresholds, so row sets agree exactly."""
    from sparkall_spark.operators.sampling import (
        N_BUCKETS,
        mix_sql,
        temperature_mix,
        temperature_weights,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("n_tok", F.size(F.split(F.trim("text"), r"\s+")))
    )
    got = {
        r["doc_id"]
        for r in temperature_mix(
            docs, "source", "n_tok", 0.5, 30_000, "doc_id"
        ).collect()
    }
    stats = {
        r["s"]: r["toks"]
        for r in docs.groupBy(F.col("source").alias("s"))
        .agg(F.sum("n_tok").alias("toks"))
        .collect()
    }
    weights = temperature_weights(stats, 0.5)
    total = sum(weights.values())
    thresholds = {
        s: int(round(min(1.0, 30_000 * (w / total) / stats[s]) * N_BUCKETS))
        for s, w in weights.items()
    }
    cases = " ".join(
        f"WHEN source = '{s}' THEN {t}" for s, t in thresholds.items()
    )
    expected = {
        r[0]
        for r in duck.execute(
            f"""
        SELECT doc_id FROM documents
        WHERE ({mix_sql("doc_id", 0)}) % {N_BUCKETS}
              < (CASE {cases} ELSE 0 END)
        """
        ).fetchall()
    }
    assert got == expected


def test_leakage_free_split_co_travels_clusters(spark):
    # pair graph: {1,2,3} one component (chained), {10,11} another,
    # 20/21/22 singletons — members must share a split, singletons must
    # match plain hash_split on their own id
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21, 22)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    w = {"train": 0.34, "val": 0.33, "test": 0.33}
    out = S.leakage_free_split(docs, w, pairs=pairs, seed=3)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 8
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11]
    plain = {
        r["doc_id"]: r["split"]
        for r in S.hash_split(docs, "doc_id", w, seed=3).collect()
    }
    for singleton in (20, 21, 22):
        assert got[singleton] == plain[singleton]
    # cluster assignment == hash of the min member id (the rep)
    assert got[1] == plain[1]
    assert got[10] == plain[10]


def test_leakage_free_split_rep_col_path_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], ["doc_id", "rep"]
    )
    w = {"train": 0.5, "test": 0.5}
    out = S.leakage_free_split(docs, w, rep_col="rep", seed=11)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert got[1] == got[2]
    # rep_col path stays map-only: no shuffle in the optimized plan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    with pytest.raises(ValueError):
        S.leakage_free_split(docs, w, seed=1)  # neither pairs nor rep
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with pytest.raises(ValueError):
        S.leakage_free_split(docs, w, pairs=pairs, rep_col="rep")  # both


def test_leakage_free_split_matches_sql_mirror_on_rep(spark):
    # the assignment is hash_split arithmetic over the representative,
    # so the DuckDB mirror is hash_split_sql applied to the rep column
    docs = spark.createDataFrame(
        [(i, i - (i % 2)) for i in range(2, 40)], ["doc_id", "rep"]
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = S.leakage_free_split(docs, w, rep_col="rep", seed=5)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    con = duckdb.connect()
    rows = ", ".join(f"({i}, {i - (i % 2)})" for i in range(2, 40))
    mirror = dict(
        con.execute(
            f"SELECT doc_id, {S.hash_split_sql('rep', w, seed=5)} AS s "
            f"FROM (VALUES {rows}) v(doc_id, rep)"
        ).fetchall()
    )
    con.close()
    assert mirror == got


def test_pack_bins_bfd_valid_and_beats_nextfit(spark, docs):
    from sparkall_spark.operators.sampling import pack_bins_bfd

    ctx = 512
    d = docs.select("doc_id", "n_chars")
    out = pack_bins_bfd(d, "doc_id", "n_chars", ctx_len=ctx, n_shards=4)
    rows = out.collect()
    n_in = d.filter("n_chars > 0").count()
    assert len(rows) == n_in
    # no bin overfull; offsets consistent with fills
    lens = {r["doc_id"]: r["n_chars"] for r in d.collect()}
    fill = {}
    for r in rows:
        key = (r["shard"], r["bin_id"])
        if not r["oversize"]:
            fill[key] = fill.get(key, 0) + lens[r["id"]]
    assert all(v <= ctx for v in fill.values())
    # BFD uses no more bins than sequential next-fit (and typically
    # far fewer padding tokens); next-fit recomputed over BFD's own
    # shards for a fair comparison
    import collections

    shard_of = {r["id"]: r["shard"] for r in rows}
    seqs = collections.defaultdict(list)
    for did, n in lens.items():
        if n > 0 and did in shard_of:
            seqs[shard_of[did]].append(n)
    nextfit_bins = 0
    for s, ls in seqs.items():
        cur = 0
        bins = 1
        for n in ls:
            if n > ctx:
                bins += 1  # dedicated, like BFD's oversize
                continue
            if cur + n > ctx:
                bins += 1
                cur = 0
            cur += n
        nextfit_bins += bins
    bfd_bins = len({(r["shard"], r["bin_id"]) for r in rows})
    assert bfd_bins <= nextfit_bins
    # deterministic under repartitioning
    again = sorted(
        (r["id"], r["shard"], r["bin_id"], r["start_offset"])
        for r in pack_bins_bfd(
            d.repartition(7), "doc_id", "n_chars", ctx_len=ctx, n_shards=4
        ).collect()
    )
    assert again == sorted(
        (r["id"], r["shard"], r["bin_id"], r["start_offset"]) for r in rows
    )


def test_pack_bins_bfd_oversize_dedicated(spark):
    from sparkall_spark.operators.sampling import pack_bins_bfd

    df = spark.createDataFrame(
        [(1, 100), (2, 900), (3, 100), (4, 450)],
        "doc_id bigint, n bigint",
    )
    rows = {
        r["id"]: r
        for r in pack_bins_bfd(
            df, "doc_id", "n", ctx_len=512, n_shards=1
        ).collect()
    }
    assert rows[2]["oversize"] and rows[2]["start_offset"] == 0
    # the oversize bin is never reused
    over_bin = rows[2]["bin_id"]
    assert all(
        r["bin_id"] != over_bin for i, r in rows.items() if i != 2
    )
    # BFD: 450 fills its own bin (450+100 > 512), the two 100s share
    assert rows[1]["bin_id"] == rows[3]["bin_id"]
    assert rows[4]["bin_id"] not in (rows[1]["bin_id"], over_bin)
    assert {rows[1]["start_offset"], rows[3]["start_offset"]} == {0, 100}


def test_pipeline_closing_stages_split_and_curriculum(spark, docs):
    from sparkall_spark.operators.pipeline import prepare_documents

    out = prepare_documents(
        docs,
        min_quality=0.0,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        split_seed=9,
        curriculum_bins=3,
    )
    rows = out.select("doc_id", "quality", "split", "curriculum_bin").collect()
    assert rows
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # split matches the standalone assignment on the surviving ids
    expected = {
        r["doc_id"]: r["split"]
        for r in S.hash_split(
            out.select("doc_id"), "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1}, seed=9,
        ).collect()
    }
    assert {r["doc_id"]: r["split"] for r in rows} == expected
    # curriculum: descending quality -> bin 0 holds the HIGHEST scores
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["curriculum_bin"], []).append(r["quality"])
    bins = sorted(by_bin)
    assert bins[0] == 0 and len(bins) >= 2
    for a, b in zip(bins, bins[1:]):
        assert min(by_bin[a]) >= max(by_bin[b]) - 1e-9


def test_filter_report_matches_pipeline_survivors(spark, docs):
    """filter_report's keep==True set must equal the rows that reach
    prepare_documents' dedup stage under the same map-side knobs —
    asserted with every Column gate engaged, including the c4 rewrite
    ordering."""
    from sparkall_spark.operators.pipeline import (
        drop_histogram,
        filter_report,
        prepare_documents,
    )

    knobs = dict(
        min_quality=0.3,
        keep_langs=("en", "de"),
        max_dup_line_ratio=0.9,
        max_dup_ngram_ratio=0.9,
        min_compression_ratio=0.2,
        max_bullet_ratio=0.9,
        max_ellipsis_ratio=0.9,
        min_alpha_word_ratio=0.1,
        max_symbol_word_ratio=0.9,
        gopher_quality=False,
        c4_rules=True,
    )
    rep = filter_report(docs, **knobs)
    kept_report = {r["doc_id"] for r in rep.filter("keep").collect()}
    # prepare_documents with ONLY these knobs: dedup keeps min id per
    # fingerprint group, so compare against the pre-dedup survivor set
    # = pipeline output plus any dropped-as-duplicate row, i.e. the
    # pipeline output must be a SUBSET and every non-kept report row
    # must be absent
    surv = {
        r["doc_id"] for r in prepare_documents(docs, **knobs).collect()
    }
    assert surv <= kept_report
    dropped_report = {r["doc_id"] for r in rep.filter("NOT keep").collect()}
    assert not (surv & dropped_report)
    assert rep.count() == docs.count()  # no rows lost: audit, not filter
    hist = {r["gate"]: r["n_failed"] for r in drop_histogram(rep).collect()}
    assert set(hist) >= {"pass_quality", "pass_lang", "keep"}
    assert hist["keep"] == rep.count() - len(kept_report)


def test_drop_histogram_counts_null_gates_as_failed(spark):
    """NULL gate values (e.g. NULL text makes every signal NULL) must
    count as failed: a NULL predicate drops the row downstream."""
    from sparkall_spark.operators.pipeline import drop_histogram

    rep = spark.createDataFrame(
        [(True, True), (False, True), (None, None)],
        "pass_quality boolean, keep boolean",
    )
    hist = {
        r["gate"]: (r["n_failed"], r["fail_rate"])
        for r in drop_histogram(rep).collect()
    }
    assert hist == {"pass_quality": (2, round(2 / 3, 6)),
                    "keep": (1, round(1 / 3, 6))}


def test_filter_report_gates_are_total_on_null_text(spark):
    """NULL text must yield False gates and keep=False (not NULL) —
    the report's keep/NOT-keep partition covers every input row, and
    prepare_documents drops such rows (NULL predicates filter out)."""
    from sparkall_spark.operators.pipeline import (
        filter_report,
        prepare_documents,
    )

    docs = spark.createDataFrame(
        [(1, "a good plain document with several ordinary words . " * 9),
         (2, None)],
        "doc_id long, text string",
    )
    rep = filter_report(docs, min_quality=0.0, c4_rules=True)
    rows = {r["doc_id"]: r for r in rep.collect()}
    assert rows[2]["keep"] is False and rows[2]["pass_c4"] is False
    assert rows[1]["keep"] in (True, False)  # total, never NULL
    assert rep.filter("keep").count() + rep.filter("NOT keep").count() == 2
    surv = {r["doc_id"] for r in prepare_documents(docs, c4_rules=True,
                                                   min_quality=0.0).collect()}
    assert 2 not in surv


def test_corpus_diff_classifies_membership_and_content(spark, duck):
    """added/removed/changed classification with normalized
    fingerprints: formatting-only churn (case/whitespace) is NOT a
    change; NULL text diffs by membership; unchanged docs emit
    nothing. DuckDB-mirrored on the same snapshots."""
    from sparkall_spark.operators.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "delta"), (4, None),
         (5, "kept verbatim")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "  ALPHA   beta "),   # normalized-equal -> no row
         (2, "gamma rewritten"),    # changed
         (4, "now has text"),       # was NULL -> changed
         (5, "kept verbatim"),      # unchanged
         (6, "brand new")],         # added; doc 3 removed
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["status"], r["old_fp"], r["new_fp"])
        for r in corpus_diff(old, new).collect()
    }
    assert {k: v[0] for k, v in got.items()} == {
        2: "changed", 3: "removed", 4: "changed", 6: "added",
    }
    assert got[6][1] is None and got[3][2] is None
    assert got[2][1] is not None and got[2][1] != got[2][2]
    # fingerprints mirror the portable rolling hash exactly
    fp_sql = """list_reduce(
        list_prepend(0::BIGINT,
          [ascii(c) FOR c IN
             list_filter(string_split(
               regexp_replace(trim(lower(coalesce(t, ''))), '\\s+', ' ', 'g'),
               ''), x -> x <> '')]),
        (acc, c) -> (acc * 31 + c) % 1000000007)"""
    want = duck.execute(
        f"SELECT {fp_sql} FROM (VALUES ('gamma rewritten')) v(t)"
    ).fetchone()[0]
    assert got[2][2] == want


def test_corpus_diff_plan_shape(spark):
    """Scale contract: map-side fingerprints into ONE full-outer
    equi-join — no window, no cartesian, no nested loop."""
    from sparkall_spark.operators.pipeline import corpus_diff

    old = spark.range(100).selectExpr("id AS doc_id",
                                      "CAST(id AS STRING) AS text")
    new = spark.range(50, 150).selectExpr("id AS doc_id",
                                          "CAST(id * 2 AS STRING) AS text")
    out = corpus_diff(old, new)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoop", "WindowExec"):
        assert bad not in plan, bad


def test_corpus_diff_precomputed_fp_columns_agree(spark):
    """r11 (VERDICT Next #4): passing a precomputed fingerprint column
    (the ingest ledger's stored exact fp) must produce the identical
    diff as the text-scan path — the nightly diff then never
    re-fingerprints yesterday's corpus."""
    from sparkall_spark.functions.text import fingerprint
    from sparkall_spark.operators.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "delta"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "ALPHA beta"), (2, "gamma rewritten"), (5, "brand new")],
        "doc_id long, text string",
    )
    want = {
        (r["doc_id"], r["status"], r["old_fp"], r["new_fp"])
        for r in corpus_diff(old, new).collect()
    }
    # ledger shape: id + stored fingerprint, NO text column at all
    fp = fingerprint(F.coalesce(F.col("text"), F.lit("")))
    old_ledger = old.select("doc_id", fp.alias("fp")).drop("text")
    got_old = {
        (r["doc_id"], r["status"], r["old_fp"], r["new_fp"])
        for r in corpus_diff(
            old_ledger, new, old_fp_col="fp"
        ).collect()
    }
    assert got_old == want
    # both sides from ledgers (the steady-state nightly shape)
    new_ledger = new.select("doc_id", fp.alias("nfp"))
    got_both = {
        (r["doc_id"], r["status"], r["old_fp"], r["new_fp"])
        for r in corpus_diff(
            old_ledger, new_ledger, old_fp_col="fp", new_fp_col="nfp"
        ).collect()
    }
    assert got_both == want
    # a ledger that stored NULL for the NULL-text doc (no coalesce at
    # build time) must still classify by MEMBERSHIP: doc 4 exists in
    # old only, so it is 'removed' — without the NULL-fp guard the
    # classifier reads old_fp IS NULL as 'absent from old' and calls
    # it 'added'
    sloppy_ledger = old.select(
        "doc_id",
        F.when(F.col("text").isNotNull(), fp).alias("fp"),
    )
    got_sloppy = {
        (r["doc_id"], r["status"], r["old_fp"], r["new_fp"])
        for r in corpus_diff(sloppy_ledger, new, old_fp_col="fp").collect()
    }
    assert got_sloppy == want  # the guard maps NULL -> fp(''), the
    # exact value the text path produces, so the whole diff matches
    assert ("removed" in {s for (d, s, _o, _n) in got_sloppy if d == 4})
