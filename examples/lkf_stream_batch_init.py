#!/usr/bin/env python
"""Train Kalman filters in BATCH mode, then continue filtering the same
keys on a STREAM — the batch-trained state is carried over through
``initialStateDistributionCol`` and a static-stream join.

Spark-first re-expression of the reference example
(/root/reference/examples/src/main/scala/com/github/ozancicek/artan/examples/
streaming/LKFStreamBatchInit.scala): local linear trend per key; the stream
resumes exactly where the batch left off.

Usage: python examples/lkf_stream_batch_init.py [num_states] [rows_per_sec] [seconds]
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import LinearKalmanFilter
from artan_spark.sources import session_builder

NOISE = 1.0


def generate_measurements(df, num_states):
    return (
        df.withColumn("stateKey", (F.col("value") % num_states).cast("string"))
        .withColumn(
            "measurement",
            F.array((F.col("value") / num_states).cast("integer").cast("double") + F.randn(0) * NOISE),
        )
    )


def main(num_states=10, mps=10, seconds=15):
    spark = session_builder("LKFStreamBatchInit", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    batch_filter = (
        LinearKalmanFilter(2, 1)
        .setStateKeyCol("stateKey")
        .setMeasurementCol("measurement")
        .setInitialStateMean(np.zeros(2))
        .setInitialStateCovariance(1000.0 * np.eye(2))
        .setProcessModel(np.array([[1.0, 1.0], [0.0, 1.0]]))
        .setProcessNoise(1e-4 * np.eye(2))
        .setMeasurementNoise(np.array([[NOISE]]))
        .setMeasurementModel(np.array([[1.0, 0.0]]))
    )

    batch_count = 10 * mps
    batch_df = generate_measurements(
        spark.range(num_states * batch_count + 1).select(F.col("id").alias("value")), num_states
    )
    batch_state = (
        batch_filter.transform(batch_df)
        .filter(F.col("stateIndex") == batch_count)
        .select("stateKey", "state")
        .cache()
    )
    batch_state.show(num_states)

    # same filter, but initial state read from the joined batch state
    stream_filter = batch_filter.copy().setInitialStateDistributionCol("state")

    stream_df = generate_measurements(
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("value", F.col("value") + num_states * batch_count),
        num_states,
    )
    stream_measurements = stream_df.join(batch_state, "stateKey")

    query = (
        stream_filter.transform(stream_measurements)
        .writeStream.queryName("LKFStreamBatchInit")
        .outputMode("append")
        .format("console")
        .start()
    )
    query.awaitTermination(seconds)
    query.stop()
    spark.stop()


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:4]]
    main(*args)
