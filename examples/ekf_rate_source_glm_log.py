#!/usr/bin/env python
"""EKF solving a GLM with log link on a rate-source stream.

Spark-first re-expression of the reference example
(/root/reference/examples/src/main/scala/com/github/ozancicek/artan/examples/
streaming/EKFRateSourceGLMLog.scala): y = exp(a*x + b) + w, w ~ N(0, 1);
states (a, b) estimated per model key with a measurement function + Jacobian.

Usage: python examples/ekf_rate_source_glm_log.py [num_states] [rows_per_sec] [seconds]
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import ExtendedKalmanFilter
from artan_spark.sources import session_builder

A, B = 0.2, 0.7


def measurement_fn(state, model):
    return np.exp(model @ state)


def measurement_jac(state, model):
    # d exp(Hx)/dx = exp(Hx) * H
    return np.exp(model @ state)[:, None] * model


def main(num_states=2, mps=10, seconds=15):
    spark = session_builder("GLMLogEKF", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    measurements = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("modelID", (F.col("value") % num_states).cast("string"))
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

    ekf = (
        ExtendedKalmanFilter(2, 1)
        .setStateKeyCol("modelID")
        .setInitialStateMean(np.zeros(2))
        .setInitialStateCovariance(10.0 * np.eye(2))
        .setMeasurementModelCol("measurementModel")
        .setProcessModel(np.eye(2))
        .setProcessNoise(np.zeros((2, 2)))
        .setMeasurementNoise(np.array([[10.0]]))
        .setMeasurementFunction(measurement_fn)
        .setMeasurementStateJacobian(measurement_jac)
        .setCalculateMahalanobis(True)
    )

    query = (
        ekf.transform(measurements)
        .select(
            "stateKey",
            "stateIndex",
            F.col("state.mean").alias("stateMean"),
            F.col("residual.mean").alias("residualMean"),
            "mahalanobis",
        )
        .writeStream.queryName("EKFRateSourceGLMLog")
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
