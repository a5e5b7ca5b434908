"""Persisted mergeable-sketch store — daily KMV + HLL summaries a lake
maintains incrementally, completing the incremental-serving family (IVF
append, near-dup signature store, frozen quality model): "distinct users
over any day range" answered from day-partitioned SKETCH rows instead of a
full raw-event rescan.

Why this is exact (and therefore testable bit-for-bit): both sketches here
are UNION-MERGEABLE with no error growth —

- KMV keeps the k smallest distinct hash values; the k smallest of a union
  is a pure function of the per-day k-smallest sets, so merge-then-estimate
  EQUALS sketch-of-the-whole (Beyer et al. 2007, "On synopses for
  distinct-value estimation under multiset operations").
- HLL registers are per-bucket maxima; max is associative/commutative/
  idempotent, so merged registers equal whole-data registers (Flajolet
  et al. 2007).

Both use the portable md5 hash and the deterministic estimators of
``plans/sketch.py`` (the store shares those estimator expressions via the
same formulas), so the merged-store estimate equals the direct
whole-range sketch to the BIT, not approximately — pinned in tests.
Appends are also IDEMPOTENT (re-appending the same day's events changes
nothing: hash-set union and register max absorb duplicates) — tested.

Store layout (``store_dir``): ``/days`` parquet partitioned by ``day``:
one row per (day, event_type) with ``kmv`` (array<long>, the <=K smallest
distinct hashes) and ``hll`` (array<int>, M_REG dense register maxima, 0 =
empty). Row count is days x event-types; bytes per row ~ K*8 + M_REG*4.

100-TB shape: the daily build is one hash-agg pass over that day's events;
a range query reads ONLY the requested day partitions (partition pruning
on the ``day`` column — plan-asserted in tests) and merges
sketch-sized rows: the raw events are never rescanned."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.plans.sketch import K, M_REG, _ALPHA_64, _TWO60, _portable_hash


def _day_sketches(events: DataFrame) -> DataFrame:
    """(day, event_type, kmv array<long>, hll array<int>) — one row per
    (day, type): distinct portable hashes -> k-smallest array + dense HLL
    register maxima (bucket agg + map_from_entries dense lookup). One
    hash-agg pass over the day's events."""
    h = events.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "event_type",
        _portable_hash(F.col("user_id")).alias("hv"),
    ).distinct()
    w = F.col("hv").bitwiseAND(F.lit((1 << 54) - 1))
    rank = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    per = h.select(
        "day", "event_type", "hv", F.shiftright("hv", 54).alias("bucket"), rank.alias("r")
    )
    regs = per.groupBy("day", "event_type", "bucket").agg(F.max("r").alias("m"))
    hll = regs.groupBy("day", "event_type").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket").cast("int"), F.col("m").cast("int")))
        ).alias("regmap")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(M_REG - 1)),
        lambda b: F.coalesce(F.col("regmap")[b], F.lit(0)),
    )
    kmv = per.groupBy("day", "event_type").agg(
        F.slice(F.array_sort(F.collect_set("hv")), 1, K).alias("kmv")
    )
    return kmv.join(hll, ["day", "event_type"]).select(
        "day", "event_type", "kmv", dense.alias("hll")
    )


def build_sketch_store(spark: SparkSession, store_dir: str, events: DataFrame) -> None:
    _day_sketches(events).write.mode("overwrite").partitionBy("day").parquet(
        store_dir + "/days"
    )


def append_sketch_days(spark: SparkSession, store_dir: str, events: DataFrame) -> None:
    """Append a new batch's per-day sketches. Same-day rows may now appear
    twice in a partition; range queries merge on read (hash-set union /
    register max), so duplicate or overlapping appends are absorbed
    EXACTLY (idempotence, tested) — no monotone-day contract needed."""
    _day_sketches(events).write.mode("append").partitionBy("day").parquet(
        store_dir + "/days"
    )


def sketch_distinct_over(
    spark: SparkSession, store_dir: str, day_from: str, day_to: str
) -> DataFrame:
    """(event_type, kmv_estimate, hll_estimate) for the inclusive day
    range, computed ONLY from stored sketch rows (partition-pruned read).
    Bit-equal to running the plans/sketch.py estimators directly over the
    raw events filtered to the same range (tested)."""
    days = (
        spark.read.parquet(store_dir + "/days")
        .filter((F.col("day") >= F.lit(day_from)) & (F.col("day") <= F.lit(day_to)))
    )
    # KMV merge: union the per-day k-smallest sets, re-take the k smallest
    hv = days.select("event_type", F.explode("kmv").alias("hv")).distinct()
    from pyspark.sql import Window

    wn = Window.partitionBy("event_type").orderBy("hv")
    topk = hv.withColumn("rn", F.row_number().over(wn)).filter(F.col("rn") <= K)
    g = topk.groupBy("event_type").agg(
        F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk")
    )
    kmv_est = F.when(F.col("kk") < K, F.col("kk").cast("double")).otherwise(
        (F.lit(float(K - 1))) / (F.col("hk") / F.lit(_TWO60))
    )

    # HLL merge: per-bucket max across days (0 stays "empty")
    regs = (
        days.select("event_type", F.posexplode("hll").alias("bucket", "m"))
        .groupBy("event_type", "bucket")
        .agg(F.max("m").alias("m"))
        .filter(F.col("m") > 0)
    )
    hg = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")).alias("sum_scaled"),
        F.count(F.lit(1)).alias("n_present"),
    )
    sum_scaled = F.col("sum_scaled") + (F.lit(M_REG) - F.col("n_present")) * F.lit(1 << 55)
    e_raw = F.lit(_ALPHA_64 * M_REG * M_REG) / (
        sum_scaled.cast("double") / F.lit(float(1 << 55))
    )
    v = F.lit(M_REG) - F.col("n_present")
    hll_est = F.when(
        (e_raw <= F.lit(2.5 * M_REG)) & (v > 0),
        F.lit(float(M_REG)) * F.log(F.lit(float(M_REG)) / v.cast("double")),
    ).otherwise(e_raw)

    return g.join(hg, "event_type").select(
        "event_type",
        kmv_est.alias("kmv_estimate"),
        F.round(hll_est, 4).alias("hll_estimate"),
    )


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES: dict = {}
