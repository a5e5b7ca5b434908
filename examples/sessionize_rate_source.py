#!/usr/bin/env python
"""Streaming sessionization: per-user activity sessions over a rate source.

Spark-native: ``session_window`` keeps ONE open-session state per key,
merged on every event and evicted once the watermark passes the session
end — the canonical events-pipeline sessionizer with bounded state
(batch counterpart + oracle: plans/temporal.events_sessionize).

The demo stream makes users bursty — each user owns a run of consecutive
rows, then goes idle forever — so sessions actually close and print
within the demo window.

Usage: python examples/sessionize_rate_source.py [rows_per_sec] [seconds]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.plans.temporal import sessionize
from artan_spark.sources import session_builder


def main(mps=50, seconds=15):
    spark = session_builder("Sessionize", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .select(
            F.floor(F.col("value") / 20).alias("user_id"),  # 20-row bursts
            F.col("timestamp").alias("ts"),
            (F.col("value") % 10).cast("double").alias("value"),
        )
        .withWatermark("ts", "2 seconds")
    )

    sessions = (
        sessionize(events, on="ts", by="user_id", gap="1 second")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )

    query = (
        sessions.writeStream.queryName("Sessionize")
        .outputMode("append")
        .format("console")
        .option("numRows", 8)
        .option("truncate", "false")
        .start()
    )
    query.awaitTermination(seconds)
    query.stop()
    spark.stop()


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:3]])
