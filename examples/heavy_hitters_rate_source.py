#!/usr/bin/env python
"""Trending items over a live stream: StreamingHeavyHitters on a
rate source.

Each rate-source row draws an item from a Zipf-ish popularity curve
(item = floor(sqrt(value % 1024)) — low ids arrive far more often), keyed
into two independent shards. Every micro-batch the operator folds the new
arrivals into its bounded Misra-Gries counters and emits a sequenced
top-k snapshot with the error certificate — O(capacity) state per key no
matter how long the stream runs.

Usage: python examples/heavy_hitters_rate_source.py [rows_per_sec] [seconds]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.sources import session_builder
from artan_spark.streaming import StreamingHeavyHitters


def main(mps=100, seconds=15):
    spark = session_builder("HeavyHittersRateSource", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .select(
            (F.col("value") % 2).cast("string").alias("shard"),
            F.floor(F.sqrt(F.col("value") % 1024)).cast("string").alias("item"),
        )
    )

    op = (
        StreamingHeavyHitters()
        .setStateKeyCol("shard")
        .setItemCol("item")
        .setCapacity(16)
        .setK(3)
    )
    query = (
        op.transform(events)
        .writeStream.queryName("HeavyHittersRateSource")
        .outputMode("append")
        .format("console")
        .option("truncate", "false")
        .start()
    )
    query.awaitTermination(seconds)
    query.stop()
    spark.stop()


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:3]]
    main(*args)
