"""Bloom semi-join reduction (operators/joins.py): exactness of the
reduce-then-join contract, actual probe-side shedding, the map-only
plan shape, and the type-safety guard."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators.joins import bloom_reduced_join, bloom_semi_reduce


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def hot_users(events):
    # a selective build side: the busiest ~10% of users
    counts = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    cut = counts.approxQuantile("n_events", [0.9], 0.0)[0]
    return counts.filter(F.col("n_events") >= cut)


def test_reduced_join_equals_plain_join(events, hot_users):
    plain = sorted(
        (r["event_id"], r["n_events"])
        for r in events.join(hot_users, "user_id", "inner")
        .select("event_id", "n_events")
        .collect()
    )
    reduced = sorted(
        (r["event_id"], r["n_events"])
        for r in bloom_reduced_join(
            events, hot_users, on="user_id", probe_key="user_id"
        )
        .select("event_id", "n_events")
        .collect()
    )
    assert reduced == plain
    assert len(plain) > 0


def test_semi_reduce_sheds_rows_but_never_partners(events, hot_users):
    reduced = bloom_semi_reduce(events, hot_users, "user_id")
    n_probe, n_reduced = events.count(), reduced.count()
    n_true = events.join(hot_users, "user_id", "left_semi").count()
    # no false negatives: every partnered row survives
    assert n_reduced >= n_true
    # the build side is ~10% of users, so the reduction must bite
    assert n_reduced < n_probe
    # survivors are a superset of the true semi-join (row identity)
    true_ids = {
        r["event_id"]
        for r in events.join(hot_users, "user_id", "left_semi")
        .select("event_id")
        .collect()
    }
    kept_ids = {r["event_id"] for r in reduced.select("event_id").collect()}
    assert true_ids <= kept_ids


def test_semi_reduce_probe_path_has_no_shuffle(spark, events, hot_users):
    """The 100 TB contract: the probe side is pruned map-only — the
    only join is the one-row-bitmap BroadcastNestedLoopJoin, and the
    probe path crosses no shuffle Exchange."""
    reduced = bloom_semi_reduce(events, hot_users, "user_id")
    reduced.count()  # let AQE finalize
    plan = reduced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    probe_side = plan.split("BroadcastNestedLoopJoin")[1].split(
        "BroadcastExchange"
    )[0]
    assert "Exchange" not in probe_side.replace("BroadcastExchange", "")


def test_key_type_mismatch_raises(spark):
    probe = spark.createDataFrame([(1,)], ["key"])
    build = spark.createDataFrame([("1",)], ["key"])
    with pytest.raises(ValueError, match="type"):
        bloom_semi_reduce(probe, build, "key")


def test_partnerless_join_types_rejected(spark):
    df = spark.createDataFrame([(1,)], ["key"])
    for how in ("left", "full", "anti", "left_anti"):
        with pytest.raises(ValueError, match="partner-dependent"):
            bloom_reduced_join(df, df, on="key", probe_key="key", how=how)


def test_key_skew_report_finds_hot_key_and_feeds_salted_join(spark):
    from pyspark.sql import functions as F

    from sparkall_spark.operators.joins import key_skew_report
    from sparkall_spark.sources.sinks import salted_join

    # 10k rows of one hot key + 1k spread keys
    hot = spark.range(10_000).select(F.lit("hot").alias("k"), "id")
    cold = spark.range(1_000).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), "id"
    )
    df = hot.unionByName(cold)
    rep = {
        r["key"]: (r["cnt"], r["salt_factor"])
        for r in key_skew_report(
            df, "k", phi=0.01, rows_per_task=2_500
        ).collect()
    }
    assert rep == {"hot": (10_000, 4)}
    # the report's salt_factor drives the mitigation end-to-end
    dim = spark.createDataFrame([("hot", 1), ("c1", 2)], ["k", "v"])
    out = salted_join(df, dim, "k", salt=rep["hot"][1])
    assert out.count() == 10_001
    # exactness: salted join == plain join
    plain = df.join(dim, "k").count()
    assert out.count() == plain


def test_key_skew_report_validation(spark):
    import pytest as _pytest

    from sparkall_spark.operators.joins import key_skew_report

    df = spark.createDataFrame([("a",)], ["k"])
    with _pytest.raises(ValueError, match="rows_per_task"):
        key_skew_report(df, "k", rows_per_task=0)


def test_semi_reduce_arrow_path_matches_column_path(spark, events, hot_users):
    col_ids = {
        r["event_id"]
        for r in bloom_semi_reduce(
            events, hot_users, "user_id", m_bits=1 << 14, impl="column"
        ).select("event_id").collect()
    }
    arr_ids = {
        r["event_id"]
        for r in bloom_semi_reduce(
            events, hot_users, "user_id", m_bits=1 << 14, impl="arrow"
        ).select("event_id").collect()
    }
    assert col_ids == arr_ids
    # auto-sizing: small build -> small bitmap -> column path, and the
    # result still preserves every true partner
    auto = bloom_semi_reduce(events, hot_users, "user_id")
    true_ids = {
        r["event_id"]
        for r in events.join(hot_users, "user_id", "left_semi")
        .select("event_id")
        .collect()
    }
    got = {r["event_id"] for r in auto.select("event_id").collect()}
    assert true_ids <= got


def test_semi_reduce_arrow_path_has_no_shuffle(spark, events, hot_users):
    red = bloom_semi_reduce(
        events, hot_users, "user_id", m_bits=1 << 18, impl="arrow"
    )
    red.count()
    plan = red._jdf.queryExecution().executedPlan().toString()
    # pure map path over the probe: Arrow eval + filter, no join at all
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
    assert "Join" not in plan


def test_semi_reduce_impl_validation(spark, events, hot_users):
    with pytest.raises(ValueError, match="impl"):
        bloom_semi_reduce(events, hot_users, "user_id", impl="magic")


def test_semi_reduce_gate_decides_from_sketches(spark):
    from pyspark.sql import functions as F
    from sparkall_spark.operators.joins import semi_reduce_gate
    from sparkall_spark.operators.sketches import cms_sketch

    probe = spark.range(10_000).select(
        (F.col("id") % 1000).cast("string").alias("k")
    )
    selective = spark.range(20).select(F.col("id").cast("string").alias("k"))
    dense = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    ps = cms_sketch(probe, "k", depth=3, width=4096)
    # selective build: ~2% of probe rows match -> reduce
    go, est = semi_reduce_gate(
        ps, cms_sketch(selective, "k", depth=3, width=4096), 3, 10_000
    )
    assert go and est >= 200
    # dense build: every probe row matches -> reduction is overhead
    go2, est2 = semi_reduce_gate(
        ps, cms_sketch(dense, "k", depth=3, width=4096), 3, 10_000
    )
    assert not go2 and est2 >= 10_000
    assert semi_reduce_gate(ps, ps, 3, 0) == (False, 0)


def test_semi_reduce_gate_pinned_ledger_mismatch_raises(spark, tmp_path):
    """r11 (VERDICT Next #5): the production shape — sketches through
    save_sketch -> load_sketch with the pinned dicts threaded into
    semi_reduce_gate — must refuse two ledgers pinned at different
    widths even when the caller omits the width argument entirely."""
    from sparkall_spark.operators.joins import semi_reduce_gate
    from sparkall_spark.operators.sketches import (
        cms_sketch,
        load_sketch,
        save_sketch,
    )

    df = spark.range(200).selectExpr("id % 37 AS k")
    save_sketch(cms_sketch(df, "k", depth=3, width=512),
                str(tmp_path / "a"), "cms", depth=3, width=512)
    save_sketch(cms_sketch(df, "k", depth=3, width=1024),
                str(tmp_path / "b"), "cms", depth=3, width=1024)
    sa, pa = load_sketch(spark, str(tmp_path / "a"), "cms")
    sb, pb = load_sketch(spark, str(tmp_path / "b"), "cms")
    with pytest.raises(ValueError, match="width=512.*width=1024"):
        semi_reduce_gate(sa, sb, depth=3, probe_rows=200,
                         params_probe=pa, params_build=pb)
    # matched pins pass and return a live decision
    sa2, pa2 = load_sketch(spark, str(tmp_path / "a"), "cms")
    go, est = semi_reduce_gate(sa2, sa2, depth=3, probe_rows=200,
                               width=512, params_probe=pa2,
                               params_build=pa2)
    assert isinstance(go, bool) and est >= 0
