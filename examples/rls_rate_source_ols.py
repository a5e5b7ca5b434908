#!/usr/bin/env python
"""Online OLS with parallel RLS filters on a rate-source stream
(reference: examples/src/main/python/streaming/rls_rate_source_ols.py).

Usage: python examples/rls_rate_source_ols.py [num_states] [rows_per_sec] [seconds]
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import RecursiveLeastSquaresFilter
from artan_spark.sources import session_builder


def main(num_states=2, mps=10, seconds=15):
    spark = session_builder("RLSRateSourceOLS", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    a, b, c = 0.5, 0.2, 1.2

    features = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("stateKey", (F.col("value") % num_states).cast("string"))
        .withColumn("x", (F.col("value") / num_states).cast("integer").cast("double"))
        .withColumn("y", F.sqrt("x"))
        .withColumn("label", F.lit(a) * F.col("x") + F.lit(b) * F.col("y") + F.lit(c) + F.randn(0))
        .withColumn("features", F.array("x", "y", F.lit(1.0)))
    )

    rls = (
        RecursiveLeastSquaresFilter(3)
        .setStateKeyCol("stateKey")
        .setInitialEstimate(np.zeros(3))
        .setRegularizationMatrixFactor(1e6)
        .setForgettingFactor(1.0)
    )

    fmt = F.udf(lambda m: "[%.2f, %.2f, %.2f]" % (m[0], m[1], m[2]))
    query = (
        rls.transform(features)
        .select("stateKey", "stateIndex", fmt("state.mean").alias("modelParameters"))
        .writeStream.queryName("RLSRateSourceOLS")
        .outputMode("append")
        .format("console")
        .start()
    )
    query.awaitTermination(seconds)
    query.stop()
    spark.stop()


if __name__ == "__main__":
    main(*[int(x) for x in sys.argv[1:4]])
