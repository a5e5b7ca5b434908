"""StreamingAsofJoin: the stateful-fold formulation must agree with the
batch window formulation (plans/temporal.asof_join) row-for-row, in batch
AND under streamed replay."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from artan_spark.operators import StreamingAsofJoin
from artan_spark.plans.temporal import asof_join
from artan_spark.sources import read_table
from artan_spark.streaming.harness import stream_transform

from conftest import SF_DIR


def _union_input(spark):
    e = read_table(spark, SF_DIR, "events").filter(F.col("user_id") < 24)
    left = e.select(
        (F.col("user_id") % 8).cast("string").alias("key"),
        "ts",
        F.lit(1).alias("side"),
        F.array("value").alias("payload"),
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 8).cast("string").alias("key"),
        "ts",
        F.lit(0).alias("side"),
        F.array("value").alias("payload"),
    )
    return left.unionByName(right), e


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out["asofPayload"] = out["asofPayload"].map(lambda v: None if v is None else tuple(v))
    out["payload"] = out["payload"].map(tuple)
    return out.sort_values(["stateKey", "eventTime", "payload"]).reset_index(drop=True)


def test_asof_operator_matches_window_formulation(spark):
    u, e = _union_input(spark)
    op = StreamingAsofJoin().setStateKeyCol("key").setEventTimeCol("ts")
    got = _norm(op.transform(u).toPandas())

    sub = e.filter(F.col("user_id") < 24)
    left = sub.select(
        (F.col("user_id") % 8).cast("string").alias("key"), "ts", F.array("value").alias("payload")
    )
    right = sub.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 8).cast("string").alias("key"),
        "ts",
        F.array("value").alias("asofPayload"),
        F.col("ts").alias("asofTime"),
    )
    want = asof_join(left, right, on="ts", by="key", payload=["asofPayload", "asofTime"])
    want = _norm(
        want.select(
            F.col("key").alias("stateKey"), F.col("ts").alias("eventTime"),
            "payload", "asofPayload", "asofTime",
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, want)


def test_asof_operator_batch_equals_stream(spark):
    u, _ = _union_input(spark)
    u = u.limit(200)
    op = (
        StreamingAsofJoin()
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setWatermarkDuration("0 seconds")
    )
    batch = _norm(op.transform(u).toPandas())
    streamed = _norm(stream_transform(spark, u, op.transform, chunk_rows=7).toPandas())
    pd.testing.assert_frame_equal(batch, streamed)
