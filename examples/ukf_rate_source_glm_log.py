#!/usr/bin/env python
"""UKF solving a GLM with log link on a rate-source stream — same setup as
the EKF variant but no Jacobian is needed (sigma points propagate through
the measurement function directly).

Spark-first re-expression of the reference example
(/root/reference/examples/src/main/scala/com/github/ozancicek/artan/examples/
streaming/UKFRateSourceGLMLog.scala).

Usage: python examples/ukf_rate_source_glm_log.py [num_states] [rows_per_sec] [seconds]
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import UnscentedKalmanFilter
from artan_spark.sources import session_builder

A, B = 0.2, 0.7


def measurement_fn(state, model):
    return np.exp(model @ state)


def main(num_states=2, mps=10, seconds=15):
    spark = session_builder("GLMLogUKF", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    measurements = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("stateKey", (F.col("value") % num_states).cast("string"))
        .withColumn("x", (F.col("value") / num_states).cast("integer").cast("double"))
        .withColumn("measurement", F.array(F.exp(F.lit(A) * F.col("x") + F.lit(B)) + F.randn(0)))
        .withColumn(
            "measurementModel",
            F.struct(
                F.lit(1).alias("numRows"),
                F.lit(2).alias("numCols"),
                F.array("x", F.lit(1.0)).alias("values"),
            ),
        )
    )

    ukf = (
        UnscentedKalmanFilter(2, 1)
        .setStateKeyCol("stateKey")
        .setInitialStateMean(np.zeros(2))
        .setInitialStateCovariance(np.eye(2))
        .setMeasurementModelCol("measurementModel")
        .setProcessModel(np.eye(2))
        .setProcessNoise(np.zeros((2, 2)))
        .setMeasurementNoise(np.eye(1))
        .setMeasurementFunction(measurement_fn)
        .setCalculateMahalanobis(True)
    )

    query = (
        ukf.transform(measurements)
        .writeStream.queryName("UKFRateSourceGLMLog")
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
