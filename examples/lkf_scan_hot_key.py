#!/usr/bin/env python
"""The hot-key estimation shape and the parallel-scan engine.

A keyed stateful fold's wall-clock is bound by ROWS PER KEY: with one
(or few) hot keys the per-key recursion is a serial chain no amount of
cluster parallelism helps — at 100x data with the same key space, the
fold serializes. ``setFoldEngine("scan")`` switches the batch LKF/RLS/
smoother folds to the associative-scan formulation (Särkkä &
García-Fernández 2021): ~log2(N) full-width numpy passes per key chain
instead of an O(N) loop, measured 22x at 1M rows on one key.

This example runs both engines on the same single-key feed and prints
their wall-clocks plus the maximum state divergence (~1e-12 relative —
the scan changes float op ORDER, not the math; keep the sequential
engine where bit-exact replay matters).

Usage: python examples/lkf_scan_hot_key.py [n_rows]
"""

import sys
import time

import numpy as np


def main(n_rows: int = 200_000):
    import pandas as pd
    from pyspark.sql import functions as F

    from artan_spark.operators import LinearKalmanFilter
    from artan_spark.sources import session_builder

    spark = session_builder(master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(11)
    walk = np.cumsum(rng.normal(0.0, 1.0, n_rows)) + rng.normal(0.0, 3.0, n_rows)
    feed = spark.createDataFrame(
        pd.DataFrame({"stateKey": ["sensor-0"] * n_rows, "measurement": [[v] for v in walk]})
    ).repartition(1).cache()
    feed.count()

    def run(engine: str):
        flt = (
            LinearKalmanFilter(1, 1)
            .setStateKeyCol("stateKey")
            .setInitialStateCovariance(np.array([[100.0]]))
            .setProcessNoise(np.array([[1.0]]))
            .setMeasurementNoise(np.array([[9.0]]))
            .setVectorizedBatch(True)
            .setFoldEngine(engine)
        )
        t0 = time.perf_counter()
        out = (
            flt.transform(feed)
            .select("stateIndex", F.col("state.mean")[0].alias("m"))
            .toPandas()
            .sort_values("stateIndex")
        )
        return time.perf_counter() - t0, out["m"].to_numpy()

    t_seq, m_seq = run("sequential")
    t_scan, m_scan = run("scan")
    rel = np.max(np.abs(m_scan - m_seq) / (np.abs(m_seq) + 1e-12))
    print(f"rows on the one hot key : {n_rows}")
    print(f"sequential engine       : {t_seq:6.2f} s")
    print(f"scan engine             : {t_scan:6.2f} s  ({t_seq / t_scan:.1f}x)")
    print(f"max relative divergence : {rel:.2e}")
    feed.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
