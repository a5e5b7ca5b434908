"""Capture `.explain("formatted")` for registry entries into plans/<dir>/.

Usage:
  python tools/capture_plans.py <sf_dir> <out_dir> <suffix> <entry1,entry2,...>

Writes <out_dir>/<entry>_<suffix>.txt with a one-line header (entry, sf_dir)
followed by the formatted plan — the plans/r12 evidence convention.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4].split(",")

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .appName("capture_plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from artan_spark.plans import PYTEST_ORACLES, QUERIES

    def entry(name):
        if name in QUERIES:
            return QUERIES[name]
        return PYTEST_ORACLES[name][0]

    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = entry(name)(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {suffix} (sf_dir={sf_dir})\n\n{plan}")
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
