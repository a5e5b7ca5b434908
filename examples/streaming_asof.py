#!/usr/bin/env python
"""Streaming point-in-time feature attach with StreamingAsofJoin.

A rate source plays both sides of the join: every 5th row is a build-side
"price update" (side=0), the rest are probe events (side=1) that should
carry the latest preceding price. State per key is the single latest build
row — O(1) per key however long the stream runs.

Usage: python examples/streaming_asof.py [num_keys] [rows_per_sec] [seconds]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import StreamingAsofJoin
from artan_spark.sources import session_builder


def main(num_keys=2, mps=10, seconds=15):
    spark = session_builder("StreamingAsof", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    rows = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("key", (F.col("value") % num_keys).cast("string"))
        .withColumn("side", F.when(F.col("value") % 5 == 0, F.lit(0)).otherwise(F.lit(1)))
        .withColumn("payload", F.array((F.col("value") * 1.5).cast("double")))
        .withColumnRenamed("timestamp", "ts")
    )

    op = (
        StreamingAsofJoin()
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setWatermarkDuration("10 seconds")
    )
    out = op.transform(rows).select(
        "stateKey", "eventTime", F.col("payload")[0].alias("event_value"),
        F.col("asofPayload")[0].alias("last_price"), "asofTime",
    )
    query = (
        out.writeStream.queryName("StreamingAsof")
        .outputMode("append")
        .format("console")
        .start()
    )
    query.awaitTermination(seconds)
    query.stop()
    spark.stop()


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:4]])
