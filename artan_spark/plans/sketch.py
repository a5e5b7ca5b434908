"""Deterministic cardinality sketches over the ``events`` table.

KMV (k-minimum-values) distinct-count estimation: hash every element to a
uniform value, keep the k smallest distinct hashes per group, and estimate
``(k-1) / h_(k)`` where ``h_(k)`` is the k-th smallest hash normalized to
[0, 1). Unlike Spark's built-in ``approx_count_distinct`` (HLL++, whose
binary registers can't be reproduced in another engine), KMV with a fixed
portable hash is fully DETERMINISTIC — both engines compute the identical
estimate, so the sketch itself is value-hash oracle-checked, not just
smoke-tested.

Portable hash (verified cross-engine in round 1): the top 15 hex digits of
md5 read as a 60-bit integer —
Spark ``conv(substring(md5(x), 1, 15), 16, 10)`` ==
DuckDB ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``.

Scale: the only full shuffle is the per-group ``distinct`` (bounded by group
cardinality, map-side partial); the k-smallest selection is a per-group sort
of already-distinct hashes. Estimator error ~ 1/sqrt(k-2) (Bar-Yossef et al.
2002, "Counting distinct elements in a data stream").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artan_spark.sources import read_table

K = 32
_TWO60 = float(1 << 60)


def _portable_hash(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate (KMV, k=32) next to the exact
    count — the estimate is deterministic, so the oracle checks it to the
    last bit (one IEEE division on identical integer operands)."""
    e = read_table(spark, sf_dir, "events")
    h = e.select("event_type", _portable_hash(F.col("user_id")).alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= K)
    g = topk.groupBy("event_type").agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk"))
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    est = F.when(F.col("kk") < K, F.col("kk").cast("double")).otherwise(
        (F.lit(float(K - 1))) / (F.col("hk") / F.lit(_TWO60))
    )
    return (
        g.join(exact, "event_type")
        .select("event_type", "n_exact", est.alias("kmv_estimate"))
    )


_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
r AS (
  SELECT event_type, hv, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
g AS (
  SELECT event_type, MAX(hv) AS hk, COUNT(*) AS kk FROM r WHERE rn <= {K} GROUP BY 1
),
x AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT g.event_type, x.n_exact,
       CASE WHEN g.kk < {K} THEN CAST(g.kk AS DOUBLE)
            ELSE {float(K - 1)} / (g.hk / {_TWO60}) END AS kmv_estimate
FROM g JOIN x ON g.event_type = x.event_type
"""


QUERIES = {"events_kmv_distinct": events_kmv_distinct}
ORACLES = {"events_kmv_distinct": _KMV_SQL}
