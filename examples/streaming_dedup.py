#!/usr/bin/env python
"""Streaming exact dedup: continuous document ingest with duplicate drops.

Spark-native: `dropDuplicatesWithinWatermark` on the content hash — the
state store holds one fingerprint per doc within the watermark horizon, so
state is bounded while late duplicates still collapse. This is the streaming
counterpart of plans/dedup.dedup_exact.

Usage: python examples/streaming_dedup.py [rows_per_sec] [seconds]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.sources import session_builder


def main(mps=50, seconds=15):
    spark = session_builder("StreamingDedup", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # synthetic docs where every 3rd row repeats an earlier document
    docs = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("doc_id", F.col("value"))
        .withColumn(
            "content",
            F.concat(F.lit("doc-"), (F.col("value") % (F.floor(F.col("value") / 3) + 1)).cast("long").cast("string")),
        )
        .withColumn("text_hash", F.md5("content"))
        .withColumnRenamed("timestamp", "ingest_ts")
        .withWatermark("ingest_ts", "30 seconds")
    )

    # immediate-emit variant for the demo; in production prefer
    # docs.dropDuplicatesWithinWatermark(["text_hash"]) which bounds the
    # fingerprint state to the watermark horizon (emits once the watermark
    # passes, so nothing prints in a 15s demo window)
    unique = docs.dropDuplicates(["text_hash"])

    query = (
        unique.select("doc_id", "text_hash", "ingest_ts")
        .writeStream.queryName("StreamingDedup")
        .outputMode("append")
        .format("console")
        .option("numRows", 5)
        .start()
    )
    query.awaitTermination(seconds)
    query.stop()
    spark.stop()


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:3]])
