"""iterate_with_truncation (r12, VERDICT r11 Next #3): the one audited
implementation of the iterative-loop plan-truncation discipline.  The
load-bearing assertion is PLAN FLATNESS — the r11 bug class was
Catalyst analysis going exponential because each round's logical tree
embedded the previous round's tree 2-3 times; these tests pin the
invariant structurally (plan size across rounds), not by timing."""

from pyspark.sql import functions as F

from sparkall_spark.operators._cache import release_caches
from sparkall_spark.operators.iterate import (
    ckpt_release,
    iterate_with_truncation,
)


def _plan_len(df) -> int:
    return len(df._jdf.queryExecution().analyzed().toString())


def _n_persisted(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_eager_mode_plans_stay_flat_across_rounds(spark):
    """refs_per_round=3 (the label-prop shape): without per-round
    truncation the analyzed plan TRIPLES per round; under the helper
    every round's input is a checkpoint leaf of constant plan size."""
    sizes = []

    def step(df, _i):
        sizes.append(_plan_len(df))
        # references the previous state three times
        return (
            df.unionByName(
                df.select("node", (F.col("comp") + 0).alias("comp"))
            )
            .unionByName(df)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )

    init = spark.range(20).select(
        F.col("id").alias("node"), F.col("id").alias("comp")
    )
    out = iterate_with_truncation(
        init, step, refs_per_round=3, max_iter=6
    )
    assert out.count() == 20
    assert len(sizes) == 6
    # flat: every round reads a LogicalRDD leaf (identical shape; only
    # rdd-id digits may differ)
    assert max(sizes) <= min(sizes) + 40
    # an untruncated 3-ref loop's plan would have grown ~3^6x
    release_caches()


def test_lazy_mode_periodic_checkpoint_resets_growth(spark):
    """refs_per_round=1 (the power-iteration shape): linear growth
    between checkpoints, reset at every checkpoint_every-th round."""
    sizes = []

    def step(df, _i):
        sizes.append(_plan_len(df))
        return df.select(
            "node", (F.col("rank") * 0.5 + 1.0).alias("rank")
        )

    init = spark.range(10).select(
        F.col("id").alias("node"), F.lit(1.0).alias("rank")
    )
    out = iterate_with_truncation(
        init, step, refs_per_round=1, max_iter=7, checkpoint_every=3
    )
    assert out.count() == 10
    # growth between checkpoints...
    assert sizes[1] > sizes[0] and sizes[2] > sizes[1]
    # ...reset right after round 3's lazy checkpoint (plan becomes a
    # LogicalRDD leaf), and again after round 6's
    assert sizes[3] < sizes[2]
    assert sizes[6] < sizes[5]
    # bounded overall: never exceeds checkpoint_every rounds of growth
    assert max(sizes) <= sizes[2] + 40


def test_eager_mode_releases_superseded_rounds(spark):
    """release_prev (the default for refs>1) keeps peak checkpoint
    storage at two state tables and leaves exactly the final frame's
    blocks, which ckpt_release then frees."""
    release_caches()
    base = _n_persisted(spark)

    def step(df, _i):
        return (
            df.unionByName(df)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )

    init = spark.range(50).select(
        F.col("id").alias("node"), F.col("id").alias("comp")
    )
    out = iterate_with_truncation(
        init, step, refs_per_round=2, max_iter=5
    )
    assert out.count() == 50
    # only the final round's checkpoint survives the loop
    assert _n_persisted(spark) <= base + 1
    ckpt_release(out)
    assert _n_persisted(spark) <= base


def test_register_routes_release_through_cache_registry(spark):
    release_caches()
    base = _n_persisted(spark)
    out = iterate_with_truncation(
        spark.range(5).select(F.col("id").alias("node")),
        lambda df, i: df.select("node"),
        refs_per_round=2, max_iter=2, register=True,
    )
    assert out.count() == 5
    assert _n_persisted(spark) >= base + 1
    release_caches()
    assert _n_persisted(spark) <= base


def test_converged_sees_both_sides_and_stops(spark):
    """converged(prev, new) runs after new is materialized and before
    prev's blocks are released — both are probeable; True ends the
    loop with new as the result."""
    seen = []

    def step(df, i):
        return df.select("node", (F.col("v") + 1).alias("v"))

    def conv(old, new):
        seen.append(
            (old.first()["v"], new.first()["v"])  # both alive here
        )
        return new.first()["v"] >= 3

    out = iterate_with_truncation(
        spark.range(1).select(F.col("id").alias("node"),
                              F.lit(0).alias("v")),
        step, refs_per_round=2, max_iter=10, converged=conv,
    )
    assert out.first()["v"] == 3
    assert seen == [(0, 1), (1, 2), (2, 3)]
    release_caches()


def test_max_iter_none_runs_to_convergence(spark):
    out = iterate_with_truncation(
        spark.range(1).select(F.lit(5).alias("v")),
        lambda df, i: df.select((F.col("v") - 1).alias("v")),
        refs_per_round=2, max_iter=None,
        converged=lambda old, new: new.first()["v"] == 0,
    )
    assert out.first()["v"] == 0


def test_refs_per_round_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="refs_per_round"):
        iterate_with_truncation(
            spark.range(1), lambda df, i: df,
            refs_per_round=0, max_iter=1,
        )


def test_connected_components_warns_on_dead_knob(spark):
    """r11 ADVICE: checkpoint_every is ignored by design — a caller
    tuning it must get a signal, not a silent discard."""
    import warnings

    from sparkall_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(edges, checkpoint_every=5).collect()
    assert any(
        issubclass(x.category, DeprecationWarning)
        and "checkpoint_every" in str(x.message)
        for x in w
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(edges).collect()
    assert not any("checkpoint_every" in str(x.message) for x in w)
    release_caches()


def test_converge_stat_stops_on_repeat_and_validates(spark):
    """r12: stat-based convergence — the loop ends the round after the
    monotone aggregate repeats; converged and converge_stat are
    mutually exclusive; lazy cadence rejects the stat form."""
    import pytest

    rounds = []

    def step(df, i):
        rounds.append(i)
        # decrease v once, then fixpoint at 0 (monotone, like
        # min-label propagation)
        return df.select(
            "node", F.greatest(F.col("v") - 1, F.lit(0)).alias("v")
        )

    out = iterate_with_truncation(
        spark.range(4).select(F.col("id").alias("node"),
                              F.lit(2).alias("v")),
        step, refs_per_round=2, max_iter=20,
        converge_stat=F.sum(F.col("v").cast("decimal(38,0)")),
    )
    assert out.agg(F.sum("v")).first()[0] == 0
    # v: 2 -> 1 -> 0 -> 0(repeat => stop): exactly 3 rounds
    assert rounds == [0, 1, 2]

    with pytest.raises(ValueError, match="not both"):
        iterate_with_truncation(
            spark.range(1), step, refs_per_round=2, max_iter=1,
            converged=lambda a, b: True, converge_stat=F.count("*"),
        )
    with pytest.raises(ValueError, match="refs_per_round"):
        iterate_with_truncation(
            spark.range(1), step, refs_per_round=1, max_iter=1,
            converge_stat=F.count("*"),
        )
    release_caches()


def test_converge_stat_releases_like_eager_mode(spark):
    release_caches()
    base = _n_persisted(spark)
    out = iterate_with_truncation(
        spark.range(30).select(F.col("id").alias("node"),
                               F.lit(3).alias("v")),
        lambda df, i: df.select(
            "node", F.greatest(F.col("v") - 1, F.lit(0)).alias("v")
        ),
        refs_per_round=2, max_iter=20,
        converge_stat=F.sum(F.col("v").cast("decimal(38,0)")),
    )
    assert out.count() == 30
    assert _n_persisted(spark) <= base + 1
    ckpt_release(out)
    assert _n_persisted(spark) <= base
