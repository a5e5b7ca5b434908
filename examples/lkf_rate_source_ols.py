#!/usr/bin/env python
"""Online OLS with multiple parallel Kalman filters on a rate-source stream.

Spark-first re-expression of the reference example
(/root/reference/examples/src/main/python/streaming/lkf_rate_source_ols.py):
array-native columns (no UDT UDFs needed), same OLS setup
z = 0.5x + 0.2y + 1.2 + N(0, 1).

Usage: python examples/lkf_rate_source_ols.py [num_states] [rows_per_sec] [seconds]
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import LinearKalmanFilter
from artan_spark.sources import session_builder
from artan_spark.types import np_to_mat


def main(num_states=2, mps=10, seconds=15):
    spark = session_builder("LKFRateSourceOLS", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    a, b, c = 0.5, 0.2, 1.2

    features = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("stateKey", (F.col("value") % num_states).cast("string"))
        .withColumn("x", (F.col("value") / num_states).cast("integer").cast("double"))
        .withColumn("y", F.sqrt("x"))
        .withColumn("w", F.randn(0))
        .withColumn("measurement", F.array(F.lit(a) * F.col("x") + F.lit(b) * F.col("y") + F.lit(c) + F.col("w")))
        .withColumn(
            "measurementModel",
            F.struct(
                F.lit(1).alias("numRows"),
                F.lit(3).alias("numCols"),
                F.array("x", "y", F.lit(1.0)).alias("values"),
            ),
        )
    )

    lkf = (
        LinearKalmanFilter(3, 1)
        .setStateKeyCol("stateKey")
        .setMeasurementModelCol("measurementModel")
        .setInitialStateMean(np.zeros(3))
        .setInitialStateCovariance(10 * np.eye(3))
        .setProcessModel(np.eye(3))
        .setProcessNoise(np.zeros((3, 3)))
        .setMeasurementNoise(np.array([[1.0]]))
    )

    fmt = F.udf(lambda m: "[%.2f, %.2f, %.2f]" % (m[0], m[1], m[2]))
    query = (
        lkf.transform(features)
        .select("stateKey", "stateIndex", fmt("state.mean").alias("modelParameters"))
        .writeStream.queryName("LKFRateSourceOLS")
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
