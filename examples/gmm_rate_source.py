#!/usr/bin/env python
"""Online Gaussian mixture estimation on a rate-source stream
(reference: examples/src/main/python/streaming/gmm_rate_source.py).

Usage: python examples/gmm_rate_source.py [rows_per_sec] [seconds]
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.operators import MultivariateGaussianMixture
from artan_spark.sources import session_builder


def main(mps=20, seconds=15):
    spark = session_builder("GMMRateSource", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # 2-component stream: alternate draws around (0, 0) and (8, 8)
    samples = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", mps)
        .load()
        .withColumn("center", (F.col("value") % 2) * 8.0)
        .withColumn("sample", F.array(F.col("center") + F.randn(1), F.col("center") + F.randn(2)))
    )

    eye = np.eye(2).ravel().tolist()
    gmm = (
        MultivariateGaussianMixture()
        .setInitialMeans([[1.0, 1.0], [6.0, 6.0]])
        .setInitialCovariances([eye, eye])
        .setMinibatchSize(10)
        .setStepSize(0.1)
    )

    fmt = F.udf(lambda d: "[%.2f, %.2f]" % (d[0]["mean"][0], d[1]["mean"][0]))
    query = (
        gmm.transform(samples)
        .select("stateIndex", fmt("mixtureModel.distributions").alias("componentMeans"), "loglikelihood")
        .writeStream.queryName("GMMRateSource")
        .outputMode("append")
        .format("console")
        .start()
    )
    query.awaitTermination(seconds)
    query.stop()
    spark.stop()


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:3]]
    main(*args)
