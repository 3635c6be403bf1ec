"""Sinks/layout helpers + custom stateful streaming operator."""

import pytest
from pyspark.sql import functions as F

from sparkall_spark.fixtures import load_table
from sparkall_spark.sources import sinks
from sparkall_spark.streaming import windows as W
from sparkall_spark.streaming.stateful import (
    detect_anomalies_batch,
    detect_anomalies_stream,
)


def test_write_partitioned_prunes(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_part")
    sinks.write_partitioned(df, path, ["o_orderpriority"])
    back = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
    n_expected = df.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == n_expected


def test_write_bucketed_no_exchange(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sinks.write_bucketed(df, "li_bucketed", ["l_orderkey"], num_buckets=4)
    t = spark.table("li_bucketed")
    agg = t.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # bucketed layout: aggregation on the bucket key needs no shuffle
    assert "Exchange" not in plan
    spark.sql("DROP TABLE li_bucketed")


def test_salted_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").count()
    salted = sinks.salted_join(li, orders, "l_orderkey", salt=4).count()
    assert salted == plain


def test_console_sink_single_execution(spark, sf_dir, capsys):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = sinks.show_console(df, n=2)
    assert n == 5
    assert "r_name" in capsys.readouterr().out


def test_anomaly_batch_detects_spike(spark):
    rows = [(1, i, float(i % 3), f"2024-01-01 00:{i:02d}:00") for i in range(20)]
    rows.append((1, 99, 1000.0, "2024-01-01 00:59:00"))
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "value", "ts_str"]
    ).withColumn("ts", F.to_timestamp("ts_str"))
    out = detect_anomalies_batch(df, z_threshold=3.0).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["zscore"] > 3


def test_anomaly_stream_end_to_end(spark, sf_dir, tmp_path):
    """applyInPandasWithState on a real file stream; streaming result
    must equal the batch twin."""
    stage = tmp_path / "ev"
    stage.mkdir()
    (stage / "p.parquet").symlink_to(f"{sf_dir}/events.parquet")
    stream = W.stream_events(spark, str(stage), ts_nanos_col="ts")
    out = detect_anomalies_stream(stream, z_threshold=2.5)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_anomalies")
        .start()
    )
    try:
        # NOTE: processAllAvailable() never quiesces under
        # ProcessingTimeTimeout (timeout-driven batches keep firing), so
        # poll until the input batches have been consumed
        import time

        for _ in range(120):
            lp = q.lastProgress
            if q.exception():
                raise AssertionError(str(q.exception()))
            if lp and lp["numInputRows"] == 0 and int(lp["batchId"]) >= 1:
                break
            time.sleep(1)
        got = {
            r["event_id"]
            for r in spark.sql("SELECT event_id FROM t_anomalies").collect()
        }
    finally:
        q.stop()
    batch = load_table(spark, sf_dir, "events")
    expected = {
        r["event_id"]
        for r in detect_anomalies_batch(batch, z_threshold=2.5).collect()
    }
    assert got == expected
    assert len(expected) > 0


def test_kmv_distinct_stream_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Streaming KMV over two micro-batches must equal the BATCH sketch
    of everything the stream has seen (KMV mergeability makes the
    incremental form exact, not approximate-on-approximate)."""
    import time

    from pyspark.sql import functions as F

    from sparkall_spark.operators.sketches import kmv_sketch
    from sparkall_spark.streaming.stateful import kmv_distinct_stream

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("doc_id").cast("string").alias("val")
    )
    stage = tmp_path / "kmv"
    stage.mkdir()
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(stage / "b0")
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(stage / "b1")
    )
    stream = (
        spark.readStream.schema("source string, val string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage / "b*"))
    )
    out = kmv_distinct_stream(stream, "val", "source", k=16)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_kmv")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_kmv").collect()
    finally:
        q.stop()
    # update mode appends one row per (batch, group); the final state
    # is the row with the highest n_kept (monotone under merging)
    got = {}
    for r in rows:
        cur = got.get(r["group"])
        if cur is None or r["n_kept"] >= cur[0]:
            got[r["group"]] = (r["n_kept"], r["est_distinct"])
    want = {
        r["source"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_sketch(docs, "val", k=16, group_cols=["source"]).collect()
    }
    assert got == want
    # fixture sources hold 25 distinct ids each > k: estimator path hit
    assert all(n == 16 for n, _ in want.values())


def test_kmv_stream_survives_null_values(spark, tmp_path):
    """r8 review: NULL values/groups must be dropped like the batch
    sketch drops them — not sink the streaming query as int(NaN)."""
    from sparkall_spark.streaming.stateful import kmv_distinct_stream

    stage = tmp_path / "kmvnull"
    stage.mkdir()
    spark.createDataFrame(
        [("g1", "a"), ("g1", None), (None, "b"), ("g1", "c")],
        "source string, val string",
    ).coalesce(1).write.parquet(str(stage / "b0"))
    stream = (
        spark.readStream.schema("source string, val string")
        .parquet(str(stage / "b*"))
    )
    q = (
        kmv_distinct_stream(stream, "val", "source", k=8)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_kmv_null")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            r["group"]: r["n_kept"]
            for r in spark.sql("SELECT * FROM t_kmv_null").collect()
        }
    finally:
        q.stop()
    assert rows == {"g1": 2}  # nulls dropped, query alive


def test_heavy_hitters_stream_one_batch_equals_batch_summary(spark, tmp_path):
    """A single-micro-batch stream must equal the batch MG summary of
    the same rows on one partition EXACTLY (same value_counts fold,
    same reduce) — the kmv stream==batch discipline."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators.sketches import misra_gries_summary
    from sparkall_spark.streaming.stateful import heavy_hitters_stream

    rows = (
        [("g", "hot")] * 40
        + [("g", "warm")] * 15
        + [("g", f"c{i}") for i in range(30)]
    )
    df = spark.createDataFrame(rows, "source string, val string")
    stage = tmp_path / "hh1"
    df.coalesce(1).write.parquet(str(stage / "b0"))
    stream = (
        spark.readStream.schema("source string, val string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage / "b*"))
    )
    out = heavy_hitters_stream(stream, "val", "source", k=6)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_hh1")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["item"]: (r["est"], r["err_bound"], r["n_rows"])
            for r in spark.sql("SELECT * FROM t_hh1").collect()
        }
    finally:
        q.stop()
    want = {
        r["item"]: (r["est"], r["err_bound"], r["n_rows"])
        for r in misra_gries_summary(
            df.coalesce(1), "val", k=6, group_cols=["source"]
        ).collect()
    }
    assert got == want and len(got) > 0


def test_heavy_hitters_stream_multibatch_guarantee(spark, tmp_path):
    """Multi-batch stream: final state must equal the sequential
    weighted-MG fold of its batches (python reference) and satisfy the
    MG guarantee (est <= true <= est + err; nothing heavy lost)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from sparkall_spark.operators.sketches import _mg_update
    from sparkall_spark.streaming.stateful import heavy_hitters_stream

    k = 5
    b0 = [("g", "hot")] * 30 + [("g", f"a{i}") for i in range(20)]
    b1 = [("g", "hot")] * 20 + [("g", "warm")] * 25 + [
        ("g", f"b{i}") for i in range(15)
    ]
    stage = tmp_path / "hh2"
    spark.createDataFrame(b0, "source string, val string").coalesce(
        1
    ).write.parquet(str(stage / "b0"))
    spark.createDataFrame(b1, "source string, val string").coalesce(
        1
    ).write.parquet(str(stage / "b1"))
    stream = (
        spark.readStream.schema("source string, val string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage / "b*"))
    )
    out = heavy_hitters_stream(stream, "val", "source", k=k)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_hh2")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_hh2").collect()
    finally:
        q.stop()
    # final state = rows with the max n_rows (monotone across batches)
    n_final = max(r["n_rows"] for r in rows)
    got = {
        r["item"]: (r["est"], r["err_bound"])
        for r in rows
        if r["n_rows"] == n_final
    }
    # python reference: the same per-batch (value_counts, reduce) fold,
    # in each possible discovery order of the two files
    def fold(batches):
        st, dec = {}, 0
        for batch in batches:
            vc = Counter(v for _, v in batch)
            dec = _mg_update(st, dec, list(vc.keys()), list(vc.values()), k)
        return {i: (c, dec) for i, c in st.items()}

    assert got in (fold([b0, b1]), fold([b1, b0]))
    true = Counter(v for _, v in b0 + b1)
    n = len(b0) + len(b1)
    assert n_final == n
    for item, (est, err) in got.items():
        assert est <= true[item] <= est + err
    for item, c in true.items():
        if c > 2 * n / (k + 1):
            assert item in got, (item, c)


def test_sampled_quantiles_stream_equals_batch_sketch(spark, tmp_path):
    """Streaming bottom-k quantiles over two micro-batches must equal
    the BATCH sampled_quantiles of everything the stream has seen —
    k-min closure makes the incremental sample exact, and the
    interpolation/rounding parity is bit-level (the kmv discipline)."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators.sketches import sampled_quantiles
    from sparkall_spark.streaming.stateful import sampled_quantiles_stream

    rows = [("g", i, float((i * 13) % 97) + 0.25) for i in range(400)]
    df = spark.createDataFrame(rows, "source string, id long, v double")
    stage = tmp_path / "bkq"
    df.filter("id % 2 = 0").coalesce(1).write.parquet(str(stage / "b0"))
    df.filter("id % 2 = 1").coalesce(1).write.parquet(str(stage / "b1"))
    stream = (
        spark.readStream.schema("source string, id long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage / "b*"))
    )
    probs = [0.1, 0.5, 0.9]
    out = sampled_quantiles_stream(stream, "v", "id", "source", probs, k=64)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_bkq")
        .start()
    )
    try:
        q.processAllAvailable()
        rows_out = spark.sql("SELECT * FROM t_bkq").collect()
    finally:
        q.stop()
    n_final = max(r["n_sampled"] for r in rows_out)
    got = {
        r["prob"]: r["quantile_est"]
        for r in rows_out
        if r["n_sampled"] == n_final
    }
    want = {
        r["prob"]: r["quantile_est"]
        for r in sampled_quantiles(df, "v", "id", probs, k=64).collect()
    }
    assert got == want and n_final == 64


def test_cms_stream_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Streaming CMS over two micro-batches must equal the BATCH
    sketch of everything the stream has seen — CMS linearity makes the
    incremental groupBy-count form exact, with state bounded by
    depth*width whatever the item universe."""
    from pyspark.sql import functions as F

    from sparkall_spark.operators.sketches import cms_sketch
    from sparkall_spark.streaming.stateful import cms_stream

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("val")
    )
    stage = tmp_path / "cms"
    stage.mkdir()
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(stage / "b0")
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(stage / "b1")
    )
    stream = (
        spark.readStream.schema("val string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage / "b*"))
    )
    out = cms_stream(stream, "val", depth=3, width=32)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_cms")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_cms").collect()
    finally:
        q.stop()
    # update mode appends a row per (batch, counter); counters are
    # monotone, so the final state is the max cnt per (d, bucket)
    got = {}
    for r in rows:
        key = (r["d"], r["bucket"])
        got[key] = max(got.get(key, 0), r["cnt"])
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_sketch(docs, "val", depth=3, width=32).collect()
    }
    assert got == want
    assert len(want) > 0
