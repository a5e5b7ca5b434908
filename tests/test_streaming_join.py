"""Stream-stream event-time interval join: the streaming form of
``events_range_join`` (purchase -> error within 6 h per user) must emit
exactly the batch join's rows. Both sides come from one replayed events
stream (filtered into two branches — a streaming self-join), each with an
event-time watermark so Spark can bound the join state; input is replayed
in ts order, so no row is ever late and the inner join must emit every
match."""

from pyspark.sql import functions as F

from artan_spark.plans.temporal import events_range_join
from artan_spark.sources import read_table
from artan_spark.streaming.harness import stream_transform

SF_DIR = "/root/testdata/sf0.001"
WINDOW_S = 21600  # same 6 h bound as events_range_join


def _transform(stream):
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    e = (
        stream.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.col("event_id").alias("error_id"),
            F.col("value").alias("error_value"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    return p.join(
        e,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {WINDOW_S} SECONDS")),
        "inner",
    ).select(F.col("p_user").alias("user_id"), "purchase_id", "error_id", "error_value")


def test_stream_stream_interval_join_matches_batch(spark):
    ev = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_type", "event_id", "value")
        .orderBy("ts")
        .localCheckpoint()
    )
    streamed = {
        tuple(r) for r in stream_transform(spark, ev, _transform, chunk_rows=200).collect()
    }
    batch = {tuple(r) for r in events_range_join(spark, SF_DIR).collect()}
    assert streamed == batch
    assert batch  # non-vacuous on this corpus


def test_stream_stream_join_chunk_invariant(spark):
    ev = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_type", "event_id", "value")
        .orderBy("ts")
        .limit(500)
        .localCheckpoint()
    )
    a = {tuple(r) for r in stream_transform(spark, ev, _transform, chunk_rows=100).collect()}
    b = {tuple(r) for r in stream_transform(spark, ev, _transform, chunk_rows=500).collect()}
    assert a == b
