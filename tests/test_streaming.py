"""Genuine Structured Streaming path: readStream → watermark → window →
memory sink, cross-checked against the batch form of the same aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_stream_matches_batch(spark):
    from neumann_spark.streaming.windows import stream_windowed_counts
    from neumann_spark.catalog import load

    q = stream_windowed_counts(spark, SF_DIR, queryName="t_stream")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM t_stream").collect()
    }
    ev = load(spark, SF_DIR, "events")
    batch = {
        (r["ws"], r["event_type"]): r["n"]
        for r in (
            ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
            .collect()
        )
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_stateful_operator_matches_batch_counts(spark):
    """applyInPandasWithState running counters equal batch groupBy counts."""
    from neumann_spark.streaming.windows import stream_stateful_user_counts
    from neumann_spark.catalog import load

    q = stream_stateful_user_counts(spark, SF_DIR, queryName="t_state")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode memory sink: last row per user is the final state
    streamed = {
        r["user_id"]: r["n_events"]
        for r in spark.sql(
            "SELECT user_id, MAX(n_events) AS n_events FROM t_state GROUP BY user_id"
        ).collect()
    }
    batch = {
        r["user_id"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert streamed == batch


def test_stream_dedup_matches_batch(spark):
    """Watermarked streaming dedup equals the clean batch aggregate."""
    from neumann_spark.catalog import load
    from neumann_spark.streaming.windows import stream_dedup_watermarked

    q = stream_dedup_watermarked(spark, SF_DIR, queryName="t_dedup")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r["event_type"]: r["n"]
        for r in spark.sql("SELECT * FROM t_dedup").collect()
    }
    batch = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert streamed == batch


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream interval join produces the same pairs as
    the batch interval join."""
    from neumann_spark.catalog import load
    from neumann_spark.streaming.windows import stream_join_streams

    q = stream_join_streams(spark, SF_DIR, queryName="t_ssjoin")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT COUNT(*) AS n FROM t_ssjoin").collect()[0]["n"]
    ev = load(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    batch = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 DAY")),
    ).count()
    assert streamed == batch and streamed > 0
