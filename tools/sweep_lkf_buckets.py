#!/usr/bin/env python
"""Vectorized-LKF bucket sweep (quiet machine!): for each bucket count, a
FRESH subprocess + SparkSession measures median-of-5 throughput of the
bench.py lkf_1000keys_vectorized shape on the sf0.1 events table. Run via

    python tools/sweep_lkf_buckets.py            # parent: all bucket counts
    python tools/sweep_lkf_buckets.py <buckets>  # child: one measurement

Results feed the SURVEY §8 sweep table and the bench.py pin.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEATS = int(os.environ.get("SWEEP_REPEATS", "5"))


def measure(buckets: int) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from artan_spark.operators import LinearKalmanFilter
    from artan_spark.sources import read_table, session_builder

    spark = session_builder(
        app_name=f"lkf-sweep-{buckets}", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.createDataFrame([(1,)], "x int").groupBy("x").applyInPandas(lambda p: p, "x int").count()

    e = read_table(spark, SF_DIR, "events").cache()
    n_rows = e.count()
    key = (F.col("event_id") % 1000).cast("string").alias("key")
    df = e.select(key, F.array("value").alias("measurement"))
    lkf = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[10.0]]))
        .setVectorizedBatch(True)
        .setVectorizedBuckets(buckets)
    )
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        lkf.transform(df).count()
        times.append(time.perf_counter() - t0)
    spark.stop()
    med = statistics.median(times)
    return {
        "buckets": buckets,
        "rows_per_sec": int(n_rows / med),
        "median_s": round(med, 3),
        "all_s": [round(t, 3) for t in times],
    }


def main() -> None:
    if len(sys.argv) > 1:
        print(json.dumps(measure(int(sys.argv[1]))))
        return
    results = []
    for b in (2, 4, 8, 16):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(b)],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        results.append(r)
        print(f"buckets={r['buckets']:2d}  {r['rows_per_sec']:6d} rows/s  "
              f"median {r['median_s']}s  runs {r['all_s']}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
