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


def test_streaming_exact_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark on the text fingerprint: duplicate
    payloads across micro-batches are dropped within the horizon."""
    import pandas as pd

    stage = tmp_path / "docs_stream"
    stage.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "ts": pd.Series(
                [base, base, base + pd.Timedelta(seconds=30)]
            ).astype("datetime64[us]"),
            "text": ["alpha doc", "beta doc", "alpha doc"],
        }
    ).to_parquet(stage / "batch0.parquet")
    pd.DataFrame(
        {
            "doc_id": [4, 5],
            "ts": pd.Series(
                [base + pd.Timedelta(seconds=60)] * 2
            ).astype("datetime64[us]"),
            "text": ["alpha  DOC", "gamma doc"],  # normalized dup of 1
        }
    ).to_parquet(stage / "batch1.parquet")

    stream = W.stream_events(spark, str(stage))
    dedup = W.stream_exact_dedup(stream, ts_col="ts", key_col="text",
                                 watermark="10 minutes")
    q = W.run_to_memory_sink(dedup, "t_stream_dedup", mode="append")
    try:
        ids = sorted(
            r["doc_id"]
            for r in spark.sql("SELECT doc_id FROM t_stream_dedup").collect()
        )
        # 3 dups of 1 (exact), 4 dups of 1 (case/whitespace-normalized)
        assert ids == [1, 2, 5]
    finally:
        q.stop()


def test_streaming_split_and_redact_stateless(spark, tmp_path):
    """Map-only operators (hash_split, redact_pii) compose onto a
    stream unchanged and agree with their batch twin — the benefit of
    keeping them pure Column expressions (r4)."""
    import pandas as pd

    from sparkall_spark.functions.text import redact_pii
    from sparkall_spark.operators.sampling import hash_split

    stage = tmp_path / "docs_split_stream"
    stage.mkdir()
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, 21)),
            "text": [
                f"doc {i} reach me at user{i}@mail.example.com" for i in range(1, 21)
            ],
        }
    )
    pdf.to_parquet(stage / "batch0.parquet")

    batch = spark.read.parquet(str(stage))
    stream = (
        spark.readStream.schema(batch.schema).parquet(str(stage))
    )

    def xform(df):
        out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.2}, seed=11)
        return out.withColumn("text", redact_pii("text"))

    q = W.run_to_memory_sink(xform(stream), "t_stream_split", mode="append")
    try:
        got = {
            r["doc_id"]: (r["split"], r["text"])
            for r in spark.sql("SELECT * FROM t_stream_split").collect()
        }
        want = {
            r["doc_id"]: (r["split"], r["text"]) for r in xform(batch).collect()
        }
        assert got == want and len(got) == 20
        assert all("[EMAIL]" in t for _, t in got.values())
        assert {s for s, _ in got.values()} == {"train", "val"}
    finally:
        q.stop()


def test_streaming_signature_near_dedup(spark, tmp_path):
    """Signature-identical near-dups are dropped within the watermark;
    genuinely different documents survive (honest partial-recall
    semantics documented on the operator)."""
    import pandas as pd

    stage = tmp_path / "sig_stream"
    stage.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")
    # docs 1 and 3 have the SAME token set (order/duplication ignored
    # by token_set shingling) -> identical signature
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "ts": pd.Series([base, base]).astype("datetime64[us]"),
            "text": ["alpha beta gamma", "wholly different text here"],
        }
    ).to_parquet(stage / "b0.parquet")
    pd.DataFrame(
        {
            "doc_id": [3, 4],
            "ts": pd.Series(
                [base + pd.Timedelta(seconds=30)] * 2
            ).astype("datetime64[us]"),
            "text": ["gamma beta alpha alpha", "yet another unique doc"],
        }
    ).to_parquet(stage / "b1.parquet")

    stream = W.stream_events(spark, str(stage))
    dedup = W.stream_signature_dedup(stream, ts_col="ts", text_col="text")
    q = W.run_to_memory_sink(dedup, "t_stream_sigdedup", mode="append")
    try:
        ids = sorted(
            r["doc_id"]
            for r in spark.sql("SELECT doc_id FROM t_stream_sigdedup").collect()
        )
        assert ids == [1, 2, 4]  # 3 is signature-identical to 1
    finally:
        q.stop()
