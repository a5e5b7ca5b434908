#!/usr/bin/env python
"""MMAE: a bank of Kalman filters solving OLS, consensus state by
sliding-likelihood weights over event-time windows.

Spark-first re-expression of the reference example
(/root/reference/examples/src/main/scala/com/github/ozancicek/artan/examples/
streaming/MMAERateSourceOLS.scala): z = 0.5x + 0.2y + 1.2 + N(0, 1), a
filter per key, aggregated with likelihood weights in 5-second windows.

Usage: python examples/mmae_rate_source_ols.py [num_states] [rows_per_sec] [seconds]
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import LinearKalmanFilter
from artan_spark.sources import session_builder


def main(num_states=10, mps=10, seconds=20):
    spark = session_builder("MMAERateSourceOLS", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    a, b, c = 0.5, 0.2, 1.2

    features = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("stateKey", (F.col("value") % num_states).cast("string"))
        .withColumn("x", (F.col("value") / num_states).cast("integer").cast("double"))
        .withColumn("y", F.sqrt("x"))
        .withColumn("label", F.array(F.lit(a) * F.col("x") + F.lit(b) * F.col("y") + F.lit(c) + F.randn(0)))
        .withColumn(
            "features",
            F.struct(
                F.lit(1).alias("numRows"),
                F.lit(3).alias("numCols"),
                F.array("x", "y", F.lit(1.0)).alias("values"),
            ),
        )
    )

    flt = (
        LinearKalmanFilter(3, 1)
        .setStateKeyCol("stateKey")
        .setMeasurementCol("label")
        .setMeasurementModelCol("features")
        .setInitialStateMean(np.zeros(3))
        .setInitialStateCovariance(10.0 * np.eye(3))
        .setProcessModel(np.eye(3))
        .setProcessNoise(np.zeros((3, 3)))
        .setMeasurementNoise(np.eye(1))
        .setSlidingLikelihoodWindow(10)
        .setEventTimeCol("timestamp")
        .setWatermarkDuration("2 seconds")
        .setMultipleModelAdaptiveEstimationEnabled(True)
        .setMultipleModelMeasurementWindowDuration("5 seconds")
    )

    trunc = F.transform(F.col("state.mean"), lambda v: F.floor(v * 100) / 100)
    query = (
        flt.transform(features)
        .select("stateIndex", trunc.alias("modelParameters"))
        .writeStream.queryName("MMAERateSourceOLS")
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
