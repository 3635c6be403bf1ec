from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

from sparkall_spark.fixtures import load_table
from sparkall_spark.streaming import windows as W


def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_tumbling_agg_batch_vs_oracle(spark, duck, sf_dir):
    df = W.tumbling_agg(
        events(spark, sf_dir),
        "ts",
        "1 hour",
        [F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value")],
        keys=["event_type"],
    ).select("window_start", "event_type", "n", "sum_value")
    assert_matches_oracle(
        df,
        duck,
        """
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
               count(*) AS n, round(sum(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
        """,
    )


def test_sliding_agg_batch(spark, sf_dir):
    df = W.sliding_agg(
        events(spark, sf_dir),
        "ts",
        "2 hours",
        "1 hour",
        [F.count("*").alias("n")],
    )
    rows = df.collect()
    # every event lands in exactly 2 sliding windows
    assert sum(r["n"] for r in rows) == events(spark, sf_dir).count() * 2


def test_session_agg_batch(spark, sf_dir):
    df = W.session_agg(
        events(spark, sf_dir),
        "ts",
        "30 minutes",
        [F.count("*").alias("n")],
        keys=["user_id"],
    )
    total = df.agg(F.sum("n")).collect()[0][0]
    assert total == events(spark, sf_dir).count()
    one = df.filter(F.col("n") > 0).first()
    assert one["session_end"] >= one["session_start"]


def test_streaming_tumbling_end_to_end(spark, sf_dir, tmp_path):
    """Real readStream -> stateful agg -> memory sink."""
    # file-source streams read a directory
    stage = tmp_path / "events_stream"
    stage.mkdir()
    (stage / "part-0.parquet").symlink_to(f"{sf_dir}/events.parquet")
    stream = W.stream_events(spark, str(stage), ts_nanos_col="ts")
    assert stream.isStreaming
    agg = W.tumbling_agg(
        stream,
        "ts",
        "1 day",
        [F.count("*").alias("n")],
        watermark="1 hour",
    )
    q = W.run_to_memory_sink(agg, "t_stream_tumbling", mode="complete")
    try:
        got = spark.sql(
            "SELECT sum(n) AS total FROM t_stream_tumbling"
        ).collect()[0]["total"]
        expected = events(spark, sf_dir).count()
        assert got == expected
    finally:
        q.stop()
