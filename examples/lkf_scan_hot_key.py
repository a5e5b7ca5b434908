#!/usr/bin/env python
"""The hot-key estimation shape and the parallel-scan engine.

A keyed stateful fold's wall-clock is bound by ROWS PER KEY: with one
(or few) hot keys the per-key recursion is a serial chain no amount of
cluster parallelism helps — at 100x data with the same key space, the
fold serializes. ``setFoldEngine("scan")`` switches the batch LKF/RLS/
smoother folds to the associative-scan formulation (Särkkä &
García-Fernández 2021): ~log2(N) full-width numpy passes per key chain
instead of an O(N) loop, measured 22x at 1M rows on one key.

``setFoldEngine("distributedScan")`` goes one further: the in-task scan
still puts the whole key on ONE task; the distributed engine chunks the
chain by event time, combines each chunk's associative elements into one
summary, prefix-combines the tiny summaries on the driver, and re-runs
the seeded scan per chunk — the hot key spans #chunks tasks.

This example runs all three engines on the same single-key feed and
prints their wall-clocks plus the maximum state divergence (~1e-12
relative — the scans change float op ORDER, not the math; keep the
sequential engine where bit-exact replay matters).

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
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(np.arange(n_rows), unit="s")
    feed = spark.createDataFrame(
        pd.DataFrame(
            {"stateKey": ["sensor-0"] * n_rows, "ts": ts, "measurement": [[v] for v in walk]}
        )
    ).repartition(8).cache()
    feed.count()

    def run(engine: str):
        flt = (
            LinearKalmanFilter(1, 1)
            .setStateKeyCol("stateKey")
            .setInitialStateCovariance(np.array([[100.0]]))
            .setProcessNoise(np.array([[1.0]]))
            .setMeasurementNoise(np.array([[9.0]]))
            .setVectorizedBatch(True)
            # the feed is multi-partition, so EVERY engine needs the
            # event-time total order (shuffle order is not ts order)
            .setEventTimeCol("ts")
            .setFoldEngine(engine)
        )
        if engine == "distributedScan":
            # 1-second cadence -> "1 hour" = 3600-row chunks; the driver
            # prefix is #chunks tiny combines
            flt.setScanChunkDuration("1 hour")
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
    t_dist, m_dist = run("distributedScan")
    rel = np.max(np.abs(m_scan - m_seq) / (np.abs(m_seq) + 1e-12))
    rel_d = np.max(np.abs(m_dist - m_seq) / (np.abs(m_seq) + 1e-12))
    print(f"rows on the one hot key : {n_rows}")
    print(f"sequential engine       : {t_seq:6.2f} s")
    print(f"scan engine             : {t_scan:6.2f} s  ({t_seq / t_scan:.1f}x)")
    print(f"distributedScan engine  : {t_dist:6.2f} s  ({t_seq / t_dist:.1f}x, cross-task)")
    print(f"max relative divergence : scan {rel:.2e}  distributed {rel_d:.2e}")
    feed.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
