#!/usr/bin/env python
"""Local linear trend (2-D state: level + trend) Kalman filtering on a
rate-source stream (reference: examples/src/main/python/streaming/
lkf_rate_source_llt.py).

Usage: python examples/lkf_rate_source_llt.py [num_states] [rows_per_sec] [seconds]
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import LinearKalmanFilter
from artan_spark.sources import session_builder


def main(num_states=2, mps=10, seconds=15):
    spark = session_builder("LKFRateSourceLLT", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    measurements = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("stateKey", (F.col("value") % num_states).cast("string"))
        .withColumn("t", (F.col("value") / num_states).cast("integer").cast("double"))
        .withColumn("measurement", F.array(F.col("t") * 0.5 + F.randn(0) * 2.0))
    )

    lkf = (
        LinearKalmanFilter(2, 1)
        .setStateKeyCol("stateKey")
        .setInitialStateCovariance(np.eye(2) * 100.0)
        .setProcessModel(np.array([[1.0, 1.0], [0.0, 1.0]]))  # level + trend
        .setProcessNoise(np.eye(2) * 1e-4)
        .setMeasurementModel(np.array([[1.0, 0.0]]))
        .setMeasurementNoise(np.array([[4.0]]))
    )

    fmt = F.udf(lambda m: "level=%.2f trend=%.2f" % (m[0], m[1]))
    query = (
        lkf.transform(measurements)
        .select("stateKey", "stateIndex", fmt("state.mean").alias("estimate"))
        .writeStream.queryName("LKFRateSourceLLT")
        .outputMode("append")
        .format("console")
        .start()
    )
    query.awaitTermination(seconds)
    query.stop()
    spark.stop()


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:4]])
