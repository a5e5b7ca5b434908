"""Key-skew diagnostics: the report you run BEFORE picking a join/agg
strategy on a new table — per-key row counts are the thing that decides
whether a shuffle key needs salting (``skew_safe_join``'s n_salts), whether
AQE's skew-join split will fire, and whether a broadcast is even legal.

``skew_report(df, key)`` emits ONE summary row: total rows, distinct keys,
mean rows/key, the heaviest key and its share, the p50/p90/p99 of the
per-key distribution — plus the derived ``suggested_salts``
(ceil(max_share * shuffle_partitions), floored at 1), the salt factor that
levels the heaviest key across the default partition count. Everything is
integer counts, exact grouped percentiles on integers, and
identical-operand divisions, so the DuckDB oracle is margin-free.

100-TB shape: ONE hash aggregate over the fact (map-side combined), then
extremes/percentiles over the KEY-sized count frame — the report never
moves the fact twice and never sorts it globally; the heaviest-key lookup
is a broadcast 1-row semi against the count frame. The reference engine
(ozancicek/artan) has no counterpart; beyond-reference diagnostics next to
``events_profile``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.sources import read_table


def skew_report(df: DataFrame, key: str, shuffle_partitions: int = 32) -> DataFrame:
    """One row: the per-key count distribution of ``df`` grouped by
    ``key``. ``top_key`` is the smallest key among those at max_rows (a
    deterministic tie-break both engines express identically).
    ``suggested_salts`` is what ``skew_safe_join``'s ``n_salts`` should be
    to level the heaviest key across ``shuffle_partitions``."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    stats = per_key.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.sum("c").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_rows_per_key"
        ),
        F.max("c").alias("max_rows"),
        F.expr("CAST(percentile(c, 0.5) AS DOUBLE)").alias("p50_rows"),
        F.expr("CAST(percentile(c, 0.9) AS DOUBLE)").alias("p90_rows"),
        F.expr("CAST(percentile(c, 0.99) AS DOUBLE)").alias("p99_rows"),
    )
    top = (
        per_key.join(F.broadcast(stats.select("max_rows")), F.col("c") == F.col("max_rows"))
        .agg(F.min(key).alias("top_key"))
    )
    return stats.crossJoin(F.broadcast(top)).select(
        "n_rows",
        "n_keys",
        "mean_rows_per_key",
        "max_rows",
        F.round(F.col("max_rows").cast("double") / F.col("n_rows"), 6).alias("max_share"),
        "top_key",
        "p50_rows",
        "p90_rows",
        "p99_rows",
        F.greatest(
            F.ceil(
                F.col("max_rows").cast("double") / F.col("n_rows") * shuffle_partitions
            ).cast("int"),
            F.lit(1),
        ).alias("suggested_salts"),
    )


def events_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: the user_id skew profile of ``events``."""
    return skew_report(read_table(spark, sf_dir, "events"), "user_id")


_SKEW_REPORT_SQL = """
WITH per_key AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
),
stats AS (
  SELECT SUM(c) AS n_rows,
         COUNT(*) AS n_keys,
         ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS mean_rows_per_key,
         MAX(c) AS max_rows,
         CAST(quantile_cont(c, 0.5) AS DOUBLE) AS p50_rows,
         CAST(quantile_cont(c, 0.9) AS DOUBLE) AS p90_rows,
         CAST(quantile_cont(c, 0.99) AS DOUBLE) AS p99_rows
  FROM per_key
),
top AS (
  SELECT MIN(user_id) AS top_key FROM per_key
  WHERE c = (SELECT MAX(c) FROM per_key)
)
SELECT n_rows, n_keys, mean_rows_per_key, max_rows,
       ROUND(CAST(max_rows AS DOUBLE) / n_rows, 6) AS max_share,
       top_key, p50_rows, p90_rows, p99_rows,
       GREATEST(CAST(CEIL(CAST(max_rows AS DOUBLE) / n_rows * 32) AS INT), 1)
         AS suggested_salts
FROM stats, top
"""

QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES = {"events_skew_report": (events_skew_report, _SKEW_REPORT_SQL)}
