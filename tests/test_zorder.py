"""Z-order clustered layout (sources/sinks.py): key portability vs the
SQL mirror, and the stats receipt — row-group min/max footers must be
tight in BOTH dimensions under Z-order where a linear sort is tight in
only its leading column."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkall_spark.sources.sinks import (
    write_zordered,
    zorder_bucket,
    zorder_key,
    zorder_key_sql,
)


def test_zorder_key_matches_sql_mirror(spark):
    df = spark.range(0, 500).select(
        (F.col("id") * 37 % 1024).alias("a"),
        (F.col("id") * 101 % 1024).alias("b"),
        "id",
    )
    got = {
        r["id"]: r["k"]
        for r in df.select(
            "id", zorder_key(["a", "b"], bits=10).alias("k")
        ).collect()
    }
    mirror = dict(
        duckdb.sql(
            "SELECT id, "
            + zorder_key_sql(["(id * 37 % 1024)", "(id * 101 % 1024)"], 10)
            + " FROM range(500) t(id)"
        ).fetchall()
    )
    assert got == mirror


def test_zorder_key_validation_and_bucket_edges(spark):
    with pytest.raises(ValueError, match="bigint"):
        zorder_key(["a", "b", "c"], bits=22)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], bits=8)
    row = (
        spark.range(1)
        .select(
            zorder_bucket(F.lit(5.0), 0.0, 10.0, 8).alias("mid"),
            zorder_bucket(F.lit(10.0), 0.0, 10.0, 8).alias("top"),
            zorder_bucket(F.lit(0.0), 0.0, 10.0, 8).alias("bot"),
            zorder_bucket(F.lit(3.0), 7.0, 7.0, 8).alias("degen"),
        )
        .first()
    )
    assert row["bot"] == 0 and row["top"] == 255
    assert 0 < row["mid"] < 255
    assert row["degen"] == 0


def _rg_spans(path, col, lo, hi):
    """Per-row-group (max-min)/global_range for a column, via parquet
    footer stats — the exact numbers a scan's skipping logic uses."""
    rows = duckdb.sql(
        f"""SELECT stats_min_value::DOUBLE, stats_max_value::DOUBLE
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema = '{col}'"""
    ).fetchall()
    assert rows
    return [(mx - mn) / (hi - lo) for mn, mx in rows]


def test_zordered_layout_tightens_stats_in_both_dims(spark, tmp_path):
    # a uniform 2-D grid: the adversarial case for linear sorting
    n = 20_000
    # x and y must be INDEPENDENT dims (two linear-mod functions of id
    # are correlated and gift the linear sort narrow y ranges)
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("y"),
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], bits=10, n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        lpath
    )
    zx = _rg_spans(zpath, "x", 0, 999)
    zy = _rg_spans(zpath, "y", 0, 999)
    ly = _rg_spans(lpath, "y", 0, 999)
    avg = lambda s: sum(s) / len(s)  # noqa: E731
    # Z-order: BOTH dimensions' stats are tight (each row group covers
    # a fraction of the range); linear sort leaves y wide open
    assert avg(zx) < 0.6 and avg(zy) < 0.6
    assert avg(ly) > 0.9
    # round-trip: the layout changes bytes on disk, not the relation
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("x"), F.sum("y")).first() == df.agg(
        F.sum("x"), F.sum("y")
    ).first()


def _executed_scan_metric(df, metric="numOutputRows"):
    """Execute ``df`` and read a metric off the EXECUTED scan leaf —
    the read-side receipt (pushed filters prune parquet row groups via
    footer min/max before rows ever reach the executor)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan" in node.nodeName():
            return node.metrics().apply(metric).value()
    raise AssertionError(f"no scan leaf in plan:\n{plan.toString()}")


def test_zordered_scan_skips_row_groups_on_trailing_dim(spark, tmp_path):
    """Query-time receipt for the z-ordered layout: a filter on y ALONE
    lets the parquet reader skip most row groups (their y min/max is
    tight under Z-order), while the linear x-sorted layout reads every
    row — asserted on the executed scan node's numOutputRows, i.e.
    rows that survived row-group skipping, not the post-filter count."""
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("y"),
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], bits=10, n_files=32)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        lpath
    )
    pred = "y >= 200 AND y <= 250"
    zq = spark.read.parquet(zpath).filter(pred)
    lq = spark.read.parquet(lpath).filter(pred)
    # same answer from both layouts
    assert sorted(map(tuple, zq.collect())) == sorted(map(tuple, lq.collect()))
    assert zq.count() > 0
    # the filter must reach the scan for skipping to happen at all
    zplan = zq._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in zplan and "GreaterThanOrEqual(y,200)" in zplan
    z_scan = _executed_scan_metric(zq)
    l_scan = _executed_scan_metric(lq)
    # linear-by-x cannot skip on y: every row is read
    assert l_scan == n
    # z-order: only row groups whose y-range intersects [200, 250]
    # survive (~1/4 of key-space prefixes plus range-boundary smear;
    # observed ~0.31 at 32 files — assert with margin)
    assert z_scan <= n * 0.4, (z_scan, l_scan)
