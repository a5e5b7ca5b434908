"""Streaming sessionization: the ``sessionize`` docstring claims the same
groupBy(session_window) runs on a watermarked stream — pin it. Stream
output (append mode) must equal the batch sessions that the final
watermark has finalized, and nothing else.

Sums are exact DECIMAL (events.value is 4-dp fixed point), so micro-batch
partial-aggregation order cannot produce float drift between the two runs.
"""

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.temporal import SESSION_GAP, sessionize
from artan_spark.sources import read_table
from artan_spark.streaming.harness import stream_transform

SF_DIR = "/root/testdata/sf0.001"


def _agg(grouped):
    return grouped.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("session_value"),
    ).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "session_value",
    )


def test_streaming_sessionize_matches_batch(spark):
    e = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "value")
        .orderBy("ts")
        .localCheckpoint()
    )
    max_ts = e.agg(F.max("ts")).first()[0]

    batch = {tuple(r) for r in _agg(sessionize(e, on="ts", by="user_id")).collect()}

    streamed_df = stream_transform(
        spark,
        e,
        lambda s: _agg(sessionize(s.withWatermark("ts", "0 seconds"), on="ts", by="user_id")),
        chunk_rows=100,
    )
    streamed = {tuple(r) for r in streamed_df.collect()}

    # append mode emits a session once the watermark (here: max event time)
    # has passed its end; sessions still open at stream end stay in state.
    finalized = {t for t in batch if t[2] <= max_ts}
    must_emit = {t for t in batch if t[2] < max_ts}
    assert streamed <= batch, "stream invented a session the batch run lacks"
    assert must_emit <= streamed, "stream withheld a watermark-finalized session"
    assert streamed <= finalized, "stream emitted a session past the final watermark"
    assert len(streamed) > 0 and len(batch) > len(streamed), (
        "non-vacuity: some sessions finalized, some still open at stream end"
    )


def test_streaming_sessionize_chunk_invariant(spark):
    """Micro-batch boundaries must not show through: 40-row and 400-row
    chunkings emit identical session sets."""
    e = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "value")
        .orderBy("ts")
        .limit(400)
        .localCheckpoint()
    )
    tf = lambda s: _agg(sessionize(s.withWatermark("ts", "0 seconds"), on="ts", by="user_id"))
    a = {tuple(r) for r in stream_transform(spark, e, tf, chunk_rows=40).collect()}
    b = {tuple(r) for r in stream_transform(spark, e, tf, chunk_rows=400).collect()}
    assert a == b
