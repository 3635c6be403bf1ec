"""KMV distinct-cardinality sketches (operators/sketches.py):
deterministic cross-engine equality, mergeability, exactness below k,
and estimator accuracy."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.sketches import (
    kmv_merge,
    kmv_overlap_estimate,
    kmv_sketch,
    kmv_sketch_sql,
)


def _words(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("word"),
    )


def test_sketch_matches_duckdb_mirror(spark, duck, sf_dir):
    """Hashes, kept count, AND the estimate are value-identical to the
    SQL mirror — the property that lets the driver's hash gate cover
    the sketch itself."""
    w = _words(spark, sf_dir)
    got = {
        r["source"]: (list(r["kmv_hashes"]), r["n_kept"], r["est_distinct"])
        for r in kmv_sketch(w, "word", k=64, group_cols=["source"]).collect()
    }
    sql = kmv_sketch_sql(
        """(SELECT source, unnest(list_filter(
              regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS word
            FROM documents)""",
        "word",
        k=64,
        group_sql="source",
    )
    want = {
        r[0]: (list(r[1]), r[3], r[4])
        for r in duck.execute(sql).fetchall()
    }
    assert set(got) == set(want)
    for src in want:
        assert got[src] == want[src], src


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "a", "b"]], ["v"]
    )
    row = kmv_sketch(df, "v", k=16).first()
    assert row["n_kept"] == 3
    assert row["est_distinct"] == 3.0


def test_merge_equals_sketch_of_union(spark):
    """KMV closure: merging two sketches gives EXACTLY the sketch of
    the unioned relation (hashes and estimate)."""
    a = spark.range(0, 4000).select(F.concat(F.lit("v"), "id").alias("v"))
    b = spark.range(2000, 6000).select(F.concat(F.lit("v"), "id").alias("v"))
    sk = kmv_merge(kmv_sketch(a, "v", k=128), kmv_sketch(b, "v", k=128))
    direct = kmv_sketch(a.unionAll(b), "v", k=128)
    r_m, r_d = sk.first(), direct.first()
    assert list(r_m["kmv_hashes"]) == list(r_d["kmv_hashes"])
    assert r_m["est_distinct"] == r_d["est_distinct"]


def test_merge_rejects_mismatched_k(spark):
    a = spark.createDataFrame([("x",)], ["v"])
    with pytest.raises(ValueError, match="k=16 and k=32"):
        kmv_merge(kmv_sketch(a, "v", k=16), kmv_sketch(a, "v", k=32))


def test_estimator_accuracy(spark):
    """6,000 distinct values, k=512: the estimate must land within
    ~5 standard errors (~22%) of truth — a deterministic check because
    the hash (and thus the estimate) is fixed."""
    df = spark.range(6000).select(F.concat(F.lit("item"), "id").alias("v"))
    est = kmv_sketch(df, "v", k=512).first()["est_distinct"]
    assert abs(est - 6000) / 6000 < 0.25, est


def test_overlap_estimate_tracks_true_jaccard(spark):
    """Two 4,000-member sets sharing 2,000 (true J = 1/3): the Beyer
    set-operation estimator must land near it, deterministically."""
    a = spark.range(0, 4000).select(F.concat(F.lit("v"), "id").alias("v"))
    b = spark.range(2000, 6000).select(F.concat(F.lit("v"), "id").alias("v"))
    row = kmv_overlap_estimate(
        kmv_sketch(a, "v", k=256), kmv_sketch(b, "v", k=256)
    ).first()
    assert abs(row["jaccard_est"] - 1 / 3) < 0.12, row
    assert abs(row["est_union"] - 6000) / 6000 < 0.25
    assert abs(row["est_intersection"] - 2000) / 2000 < 0.45


def test_groupwise_sketch_shapes(spark):
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", None)], ["g", "v"]
    )
    rows = {
        r["g"]: r for r in kmv_sketch(df, "v", k=8, group_cols=["g"]).collect()
    }
    assert rows["g1"]["n_kept"] == 2 and rows["g1"]["est_distinct"] == 2.0
    # NULLs are not distinct values
    assert rows["g2"]["n_kept"] == 1 and rows["g2"]["est_distinct"] == 1.0


def test_sketch_plan_has_no_global_window(spark):
    """Two-phase k-min (r8 review): an ungrouped sketch must not plan a
    row_number window with an empty partition spec — that moves EVERY
    distinct hash onto one task, the COUNT(DISTINCT) bottleneck the
    sketch exists to avoid."""
    df = spark.range(1000).select(F.concat(F.lit("v"), "id").alias("v"))
    plan = (
        kmv_sketch(df, "v", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_overlap_estimate_accepts_explicit_k(spark):
    a = spark.range(0, 500).select(F.concat(F.lit("v"), "id").alias("v"))
    b = spark.range(250, 750).select(F.concat(F.lit("v"), "id").alias("v"))
    sa, sb = kmv_sketch(a, "v", k=64), kmv_sketch(b, "v", k=64)
    implicit = kmv_overlap_estimate(sa, sb).first()
    explicit = kmv_overlap_estimate(sa, sb, k=64).first()
    assert implicit == explicit


# --- Misra-Gries heavy hitters ----------------------------------------------


def _skewed_rows():
    rows = (
        [("src0", "hot")] * 300
        + [("src0", "warm")] * 100
        + [("src0", f"cold{i}") for i in range(200)]
    )
    return rows


def test_mg_reduce_unit():
    from sparkall_spark.operators.sketches import _mg_reduce

    c = {"a": 10, "b": 7, "c": 3, "d": 3, "e": 1}
    dec = _mg_reduce(c, 2)
    # (k+1)-th largest of [10,7,3,3,1] with k=2 is 3; survivors strictly
    # above 3 keep (count - 3)
    assert dec == 3 and c == {"a": 7, "b": 4}
    c2 = {"a": 5, "b": 4}
    assert _mg_reduce(c2, 2) == 0 and c2 == {"a": 5, "b": 4}


def test_mg_summary_guarantee_under_repartition(spark):
    from collections import Counter

    from sparkall_spark.operators.sketches import misra_gries_summary

    rows = _skewed_rows()
    true = Counter(v for _, v in rows)
    n = len(rows)
    k = 8
    df = spark.createDataFrame(rows, "source string, val string")
    for parts in (1, 3, 7, 16):
        got = misra_gries_summary(df.repartition(parts), "val", k=k).collect()
        assert 0 < len(got) <= k
        for r in got:
            assert r["n_rows"] == n
            assert r["est"] <= true[r["item"]] <= r["est"] + r["err_bound"], (
                parts,
                r,
            )
        items = {r["item"] for r in got}
        for item, c in true.items():
            if c > 2 * n / (k + 1):
                assert item in items, (parts, item, c)


def test_heavy_hitters_exact_and_layout_independent(spark):
    from collections import Counter

    from sparkall_spark.operators.sketches import heavy_hitters

    rows = _skewed_rows()
    true = Counter(v for _, v in rows)
    n = len(rows)
    phi = 0.15
    want = {
        item: (c, round(c / n, 6)) for item, c in true.items() if c >= phi * n
    }
    assert set(want) == {"hot", "warm"}  # fixture sanity
    df = spark.createDataFrame(rows, "source string, val string")
    for parts in (1, 5, 13):
        got = {
            r["item"]: (r["cnt"], r["share"])
            for r in heavy_hitters(df.repartition(parts), "val", phi).collect()
        }
        assert got == want, parts


def test_heavy_hitters_grouped(spark):
    from sparkall_spark.operators.sketches import heavy_hitters

    rows = _skewed_rows() + [("src1", "only")] * 10 + [("src1", "x")] * 2
    df = spark.createDataFrame(rows, "source string, val string")
    got = {
        (r["source"], r["item"]): r["cnt"]
        for r in heavy_hitters(
            df.repartition(7), "val", 0.25, group_cols=["source"]
        ).collect()
    }
    assert got == {("src0", "hot"): 300, ("src1", "only"): 10}


def test_heavy_hitters_validation(spark):
    import pytest

    from sparkall_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",)], "val string")
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "val", 0.0)
    with pytest.raises(ValueError, match="cannot guarantee"):
        heavy_hitters(df, "val", 0.1, k=10)  # needs k > 19


def test_mg_summary_nulls_dropped_and_bounded_output(spark):
    from sparkall_spark.operators.sketches import misra_gries_summary

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "val string"
    )
    got = {r["item"]: r for r in misra_gries_summary(df, "val", k=4).collect()}
    assert {i: r["est"] for i, r in got.items()} == {"a": 2, "b": 1}
    assert all(r["n_rows"] == 3 and r["err_bound"] == 0 for r in got.values())


# --- bottom-k sampled quantiles ----------------------------------------------


def test_bottomk_sample_partition_invariant_and_exact_below_k(spark):
    from sparkall_spark.operators.sketches import bottomk_sample

    rows = [(i, float(i % 37)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    base = bottomk_sample(df, "v", "id", k=64).collect()[0]
    for parts in (1, 7, 16):
        r = bottomk_sample(df.repartition(parts), "v", "id", k=64).collect()[0]
        assert [tuple(x) for x in r["sample_hv"]] == [
            tuple(x) for x in base["sample_hv"]
        ]
        assert r["n_kept"] == 64 and r["n_rows"] == 200
    # below k the sample IS the data
    small = spark.createDataFrame(rows[:10], "id long, v double")
    r = bottomk_sample(small, "v", "id", k=64).collect()[0]
    assert r["n_kept"] == 10
    assert sorted(x["v"] for x in r["sample_hv"]) == sorted(
        v for _, v in rows[:10]
    )


def test_bottomk_merge_equals_sample_of_union(spark):
    from sparkall_spark.operators.sketches import bottomk_merge, bottomk_sample

    rows = [(i, float((i * 7) % 101)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = df.filter("id % 2 = 0")
    b = df.filter("id % 2 = 1")
    merged = bottomk_merge(
        bottomk_sample(a, "v", "id", k=32),
        bottomk_sample(b, "v", "id", k=32),
        k=32,
    ).collect()[0]
    want = bottomk_sample(df, "v", "id", k=32).collect()[0]
    assert [tuple(x) for x in merged["sample_hv"]] == [
        tuple(x) for x in want["sample_hv"]
    ]
    assert merged["n_rows"] == 300


def test_sampled_quantiles_accuracy_and_exact_small(spark):
    from sparkall_spark.operators.sketches import sampled_quantiles

    # exact below k: quantiles of 0..99 keyed by id
    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["prob"]: r["quantile_est"]
        for r in sampled_quantiles(
            df, "v", "id", probs=[0.0, 0.5, 1.0], k=256
        ).collect()
    }
    assert got == {0.0: 0.0, 0.5: 49.5, 1.0: 99.0}
    # sampled: uniform 0..9999, k=400 -> DKW bound ~ sqrt(ln(40)/800)
    big = spark.createDataFrame(
        [(i, float(i)) for i in range(10_000)], "id long, v double"
    )
    est = {
        r["prob"]: r["quantile_est"]
        for r in sampled_quantiles(
            big, "v", "id", probs=[0.25, 0.5, 0.9], k=400
        ).collect()
    }
    for p, q in est.items():
        assert abs(q / 10_000 - p) < 0.1, (p, q)


def test_sampled_quantiles_grouped_and_validation(spark):
    import pytest

    from sparkall_spark.operators.sketches import sampled_quantiles

    rows = [("a", i, float(i)) for i in range(50)] + [
        ("b", 100 + i, 1000.0 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        (r["g"], r["prob"]): r["quantile_est"]
        for r in sampled_quantiles(
            df, "v", "id", probs=[0.5], k=256, group_cols=["g"]
        ).collect()
    }
    assert got == {("a", 0.5): 24.5, ("b", 0.5): 1009.5}
    with pytest.raises(ValueError, match="non-empty"):
        sampled_quantiles(df, "v", "id", probs=[])
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        sampled_quantiles(df, "v", "id", probs=[1.5])


# --- Count-Min sketch --------------------------------------------------------


def test_cms_sketch_matches_duckdb_mirror(spark, duck, sf_dir):
    """The counter table is a pure function of the input multiset —
    value-identical to the SQL mirror, so hash gates cover the sketch."""
    from sparkall_spark.operators.sketches import cms_sketch, cms_sketch_sql

    w = _words(spark, sf_dir)
    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_sketch(w, "word", depth=3, width=64).collect()
    }
    sql = cms_sketch_sql(
        """(SELECT unnest(list_filter(
              regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS word
            FROM documents)""",
        "word",
        depth=3,
        width=64,
    )
    want = {(d, b): c for d, b, c in duck.execute(sql).fetchall()}
    assert got == want
    assert len(got) > 0


def test_cms_estimate_never_undercounts_and_exact_when_sparse(spark):
    """Structural guarantees: est >= true always; est == true when the
    item universe is far below width (collision-free rows)."""
    from sparkall_spark.operators.sketches import cms_query, cms_sketch

    rows = (
        [("apple",)] * 7 + [("pear",)] * 3 + [("plum",)] * 1
    )
    df = spark.createDataFrame(rows, ["w"])
    sk = cms_sketch(df, "w", depth=4, width=4096)
    probes = spark.createDataFrame(
        [("apple",), ("pear",), ("plum",), ("absent",)], ["w"]
    )
    got = {
        r["w"]: r["est"]
        for r in cms_query(sk, probes, "w", depth=4, width=4096).collect()
    }
    true = {"apple": 7, "pear": 3, "plum": 1, "absent": 0}
    for k, t in true.items():
        assert got[k] >= t
    # 3 distinct items in 4096 buckets x 4 independent rows: exact
    assert got == true


def test_cms_merge_linearity_and_layout_independence(spark, sf_dir):
    """sketch(A) + sketch(B) == sketch(A union B), elementwise; and the
    counter table is identical under any repartitioning."""
    from sparkall_spark.operators.sketches import cms_merge, cms_sketch

    w = _words(spark, sf_dir)
    a = w.filter(F.crc32("word") % 2 == 0)
    b = w.filter(F.crc32("word") % 2 == 1)

    def tbl(df):
        return {(r["d"], r["bucket"]): r["cnt"] for r in df.collect()}

    merged = tbl(
        cms_merge(
            cms_sketch(a, "word", depth=3, width=128),
            cms_sketch(b, "word", depth=3, width=128),
        )
    )
    whole = tbl(cms_sketch(w, "word", depth=3, width=128))
    assert merged == whole
    shuffled = tbl(
        cms_sketch(w.repartition(7), "word", depth=3, width=128)
    )
    assert shuffled == whole


def test_cms_weighted_and_grouped(spark):
    """weight_col sums weights instead of occurrences; group_cols keep
    independent counter tables per group, and grouped queries resolve
    against the right group's counters."""
    from sparkall_spark.operators.sketches import cms_query, cms_sketch

    df = spark.createDataFrame(
        [("g1", "x", 10), ("g1", "x", 5), ("g2", "x", 2), ("g2", "y", 4)],
        ["g", "w", "wt"],
    )
    sk = cms_sketch(
        df, "w", depth=2, width=512, group_cols=["g"], weight_col="wt"
    )
    probes = spark.createDataFrame(
        [("g1", "x"), ("g2", "x"), ("g2", "y"), ("g1", "y")], ["g", "w"]
    )
    got = {
        (r["g"], r["w"]): r["est"]
        for r in cms_query(
            sk, probes, "w", depth=2, width=512, group_cols=["g"]
        ).collect()
    }
    assert got == {
        ("g1", "x"): 15,
        ("g2", "x"): 2,
        ("g2", "y"): 4,
        ("g1", "y"): 0,
    }


def test_cms_query_is_map_only_under_broadcast(spark):
    """The 100 TB contract: probe scoring must not shuffle the probes —
    depth chained BroadcastHashJoins, zero Exchange on the probe path."""
    from sparkall_spark.operators.sketches import cms_query, cms_sketch

    df = spark.createDataFrame([("a",), ("b",)], ["w"])
    sk = cms_sketch(df, "w", depth=4, width=256)
    # materialize the sketch first so only the query plan is inspected
    sk = spark.createDataFrame(sk.collect(), sk.schema)
    probes = spark.createDataFrame([("a",), ("zzz",)], ["w"])
    out = cms_query(sk, probes, "w", depth=4, width=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # the only Exchanges on the path are broadcast ones — no shuffle
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
    got = {r["w"]: r["est"] for r in out.collect()}
    assert got == {"a": 1, "zzz": 0}


def test_cms_join_cardinality_upper_bounds_and_converges(spark):
    """Structural: est >= true join size for any hash; exact when the
    key universe is far below width (no colliding cross-terms)."""
    from sparkall_spark.operators.sketches import (
        cms_join_cardinality,
        cms_sketch,
    )

    a = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 2 + [("only_a",)], ["k"]
    )
    b = spark.createDataFrame(
        [("x",)] * 3 + [("y",)] * 4 + [("only_b",)] * 7, ["k"]
    )
    true_join = a.join(b, "k").count()  # 5*3 + 2*4 = 23
    assert true_join == 23
    for width in (8, 4096):
        est = cms_join_cardinality(
            cms_sketch(a, "k", depth=3, width=width),
            cms_sketch(b, "k", depth=3, width=width),
            depth=3,
        ).first()["est_join_rows"]
        assert est >= true_join
        if width == 4096:
            assert est == true_join
    # disjoint key sets -> exact 0 (the densify-over-depth path)
    c = spark.createDataFrame([("zzz",)], ["k"])
    est0 = cms_join_cardinality(
        cms_sketch(a, "k", depth=3, width=4096),
        cms_sketch(c, "k", depth=3, width=4096),
        depth=3,
    ).first()["est_join_rows"]
    assert est0 == 0


def test_cms_join_cardinality_validates_bucket_domain(spark):
    """Passing width pins the bucket domain: sketches built with a
    different width (or depth) raise instead of silently mis-pairing
    buckets and voiding the one-sided bound."""
    import pytest

    from sparkall_spark.operators.sketches import (
        cms_join_cardinality,
        cms_sketch,
    )

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, ["k"])
    b = spark.createDataFrame([("x",)] * 3 + [("y",)] * 4, ["k"])
    ok = cms_join_cardinality(
        cms_sketch(a, "k", depth=3, width=4096),
        cms_sketch(b, "k", depth=3, width=4096),
        depth=3,
        width=4096,
    ).first()["est_join_rows"]
    assert ok == 5 * 3 + 2 * 4
    # 200 distinct keys in a width-4096 sketch put buckets well past 8
    wide = cms_sketch(
        spark.range(200).selectExpr("CAST(id AS STRING) AS k"),
        "k", depth=3, width=4096,
    )
    with pytest.raises(ValueError, match="width"):
        cms_join_cardinality(
            cms_sketch(a, "k", depth=3, width=8), wide, depth=3, width=8,
        )
    with pytest.raises(ValueError, match="depth"):
        cms_join_cardinality(
            cms_sketch(a, "k", depth=2, width=4096),
            cms_sketch(b, "k", depth=3, width=4096),
            depth=3,
            width=4096,
        )
    # the data check is one-sided (a NARROWER sketch's buckets fit the
    # declared domain trivially) — pinned params catch that direction
    with pytest.raises(ValueError, match="pins width=8"):
        cms_join_cardinality(
            cms_sketch(a, "k", depth=3, width=8),
            cms_sketch(b, "k", depth=3, width=4096),
            depth=3,
            width=4096,
            params_a={"depth": 3, "width": 8},
            params_b={"depth": 3, "width": 4096},
        )
    with pytest.raises(ValueError, match="pins depth=2"):
        cms_join_cardinality(
            cms_sketch(a, "k", depth=3, width=4096),
            cms_sketch(b, "k", depth=3, width=4096),
            depth=3,
            width=4096,
            params_b={"depth": 2, "width": 4096},
        )
    # r10 advice: with width OMITTED, two pinned sketches must still
    # agree with EACH OTHER — a=8 vs b=4096 is the silent mis-pairing
    with pytest.raises(ValueError, match="width=8.*width=4096"):
        cms_join_cardinality(
            cms_sketch(a, "k", depth=3, width=8),
            cms_sketch(b, "k", depth=3, width=4096),
            depth=3,
            params_a={"depth": 3, "width": 8},
            params_b={"depth": 3, "width": 4096},
        )
    with pytest.raises(ValueError, match="depth=3.*depth=2"):
        cms_join_cardinality(
            cms_sketch(a, "k", depth=3, width=4096),
            cms_sketch(b, "k", depth=3, width=4096),
            depth=3,
            params_a={"depth": 3, "width": 4096},
            params_b={"depth": 2, "width": 4096},
        )


def test_sketch_save_load_pins_parameters(spark, sf_dir, tmp_path):
    from sparkall_spark.operators.sketches import (
        cms_query,
        cms_sketch,
        kmv_merge,
        kmv_sketch,
        load_sketch,
        save_sketch,
    )

    w = _words(spark, sf_dir)
    # kmv round-trip + merge against the loaded sketch
    sk = kmv_sketch(w, "word", k=32)
    save_sketch(sk, str(tmp_path / "kmv"), "kmv", k=32)
    loaded, params = load_sketch(spark, str(tmp_path / "kmv"), "kmv", k=32)
    assert params == {"k": 32}
    merged = kmv_merge(loaded, sk, k=32).first()
    assert merged["est_distinct"] == sk.first()["est_distinct"]
    # mismatched k raises loudly instead of mis-merging
    with pytest.raises(ValueError, match="pins k=32"):
        load_sketch(spark, str(tmp_path / "kmv"), "kmv", k=64)
    with pytest.raises(ValueError, match="kind"):
        load_sketch(spark, str(tmp_path / "kmv"), "cms", depth=3, width=64)
    # cms round-trip: loaded counters answer queries identically
    cs = cms_sketch(w.select("word"), "word", depth=3, width=64)
    save_sketch(cs, str(tmp_path / "cms"), "cms", depth=3, width=64)
    lc, p2 = load_sketch(
        spark, str(tmp_path / "cms"), "cms", depth=3, width=64
    )
    probes = spark.createDataFrame([("the",), ("zz",)], ["word"])
    a = {r["word"]: r["est"] for r in cms_query(cs, probes, "word", 3, 64).collect()}
    b = {r["word"]: r["est"] for r in cms_query(lc, probes, "word", 3, 64).collect()}
    assert a == b
    # wrong/missing parameter sets rejected at save time
    with pytest.raises(ValueError, match="pin exactly"):
        save_sketch(cs, str(tmp_path / "bad"), "cms", depth=3)
    with pytest.raises(ValueError, match="unknown sketch kind"):
        save_sketch(cs, str(tmp_path / "bad"), "hll", k=1)


def test_save_load_sketches_batched_roundtrip(spark, tmp_path):
    """r12 (VERDICT Next #2): a sketch PAIR persists through one
    tagged-union write + one shared read, and the loaded slices +
    pinned params must be byte-identical to the per-sketch lifecycle
    (same rows, same params, same validation errors)."""
    import pytest

    from sparkall_spark.operators.sketches import (
        cms_sketch,
        load_sketches,
        save_sketches,
    )

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, ["k"])
    b = spark.createDataFrame([("x",)] * 3 + [("z",)] * 4, ["k"])
    sk_a = cms_sketch(a, "k", depth=3, width=64)
    sk_b = cms_sketch(b, "k", depth=3, width=64)
    p = {"depth": 3, "width": 64}
    path = str(tmp_path / "pair")
    save_sketches({"probe": (sk_a, p), "build": (sk_b, p)}, path, "cms")

    loaded = load_sketches(spark, path, "cms")
    assert set(loaded) == {"probe", "build"}
    for name, orig in (("probe", sk_a), ("build", sk_b)):
        rows, params = loaded[name]
        assert params == p
        assert sorted(map(tuple, rows.collect())) == sorted(
            map(tuple, orig.collect())
        )

    # wrong kind at load; wrong/missing params at save
    with pytest.raises(ValueError, match="kind"):
        load_sketches(spark, path, "kmv")
    with pytest.raises(ValueError, match="pin exactly"):
        save_sketches(
            {"probe": (sk_a, {"depth": 3})}, str(tmp_path / "bad"), "cms"
        )
    with pytest.raises(ValueError, match="empty"):
        save_sketches({}, str(tmp_path / "bad2"), "cms")


def test_save_sketches_feeds_join_cardinality_gate(spark, tmp_path):
    """The batched pair must thread into cms_join_cardinality exactly
    like two load_sketch results: pinned params validate, the estimate
    matches the unpersisted sketches'."""
    from sparkall_spark.operators.sketches import (
        cms_join_cardinality,
        cms_sketch,
        load_sketches,
        save_sketches,
    )

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, ["k"])
    b = spark.createDataFrame([("x",)] * 3 + [("y",)] * 4, ["k"])
    sk_a = cms_sketch(a, "k", depth=3, width=4096)
    sk_b = cms_sketch(b, "k", depth=3, width=4096)
    p = {"depth": 3, "width": 4096}
    path = str(tmp_path / "gatepair")
    save_sketches({"probe": (sk_a, p), "build": (sk_b, p)}, path, "cms")
    loaded = load_sketches(spark, path, "cms")
    (pa, pp), (pb, bp) = loaded["probe"], loaded["build"]
    est = cms_join_cardinality(
        pa, pb, depth=3, width=4096, params_a=pp, params_b=bp
    ).first()["est_join_rows"]
    assert est == 5 * 3 + 2 * 4
