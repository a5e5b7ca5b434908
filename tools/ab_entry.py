"""Fresh-JVM A/B timing of selected registry entries (bench methodology:
df.count(), repeats recorded raw, median reported).

Usage: python tools/ab_entry.py <sf_dir> <entry1,entry2,...> [repeats]
Run it from the tree to measure (old = a worktree at the baseline commit,
new = the working tree).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .appName("ab_entry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from artan_spark.plans import QUERIES

    for name in names:
        fn = QUERIES[name]
        times = []
        nrows = None
        for _ in range(reps):
            t0 = time.perf_counter()
            nrows = fn(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        med = sorted(times)[len(times) // 2]
        print(f"AB {name}: median {med:.3f}s repeats {times} rows={nrows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
