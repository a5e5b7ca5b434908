"""Persisted mergeable-sketch store: merged day sketches equal the direct
whole-range sketch to the bit, appends are idempotent/overlap-safe, and
the range read is partition-pruned on day."""

import pyspark.sql.functions as F

from artan_spark.plans.sketch import K, M_REG, _ALPHA_64, _TWO60, _portable_hash
from artan_spark.plans.sketch_store import (
    append_sketch_days,
    build_sketch_store,
    sketch_distinct_over,
)
from artan_spark.sources import read_table

from conftest import SF_DIR


def _direct_estimates(events):
    """The plans/sketch.py estimators run directly over a raw-event frame
    (the whole-range reference the merged store must reproduce)."""
    from pyspark.sql import Window

    h = events.select("event_type", _portable_hash(F.col("user_id")).alias("hv")).distinct()
    wn = Window.partitionBy("event_type").orderBy("hv")
    topk = h.withColumn("rn", F.row_number().over(wn)).filter(F.col("rn") <= K)
    g = topk.groupBy("event_type").agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk"))
    kmv_est = F.when(F.col("kk") < K, F.col("kk").cast("double")).otherwise(
        (F.lit(float(K - 1))) / (F.col("hk") / F.lit(_TWO60))
    )
    w = F.col("hv").bitwiseAND(F.lit((1 << 54) - 1))
    rank = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    regs = (
        h.select("event_type", F.shiftright("hv", 54).alias("bucket"), rank.alias("r"))
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m"))
    )
    hg = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")).alias("sum_scaled"),
        F.count(F.lit(1)).alias("n_present"),
    )
    sum_scaled = F.col("sum_scaled") + (F.lit(M_REG) - F.col("n_present")) * F.lit(1 << 55)
    e_raw = F.lit(_ALPHA_64 * M_REG * M_REG) / (sum_scaled.cast("double") / F.lit(float(1 << 55)))
    v = F.lit(M_REG) - F.col("n_present")
    hll_est = F.when(
        (e_raw <= F.lit(2.5 * M_REG)) & (v > 0),
        F.lit(float(M_REG)) * F.log(F.lit(float(M_REG)) / v.cast("double")),
    ).otherwise(e_raw)
    return {
        r.event_type: r
        for r in g.join(hg, "event_type")
        .select("event_type", kmv_est.alias("kmv_estimate"), F.round(hll_est, 4).alias("hll_estimate"))
        .collect()
    }


def test_merged_store_equals_direct_sketch(spark, tmp_path):
    e = read_table(spark, SF_DIR, "events")
    sd = str(tmp_path / "sk")
    build_sketch_store(spark, sd, e)

    for lo, hi in [("2024-01-01", "2024-01-30"), ("2024-01-05", "2024-01-12")]:
        day = F.date_trunc("day", F.col("ts")).cast("date")
        direct = _direct_estimates(
            e.filter((day >= F.lit(lo)) & (day <= F.lit(hi)))
        )
        merged = {
            r.event_type: r for r in sketch_distinct_over(spark, sd, lo, hi).collect()
        }
        assert set(direct) == set(merged) and merged
        for t in direct:
            assert merged[t].kmv_estimate == direct[t].kmv_estimate, (lo, t)
            assert merged[t].hll_estimate == direct[t].hll_estimate, (lo, t)


def test_append_split_and_idempotence(spark, tmp_path):
    e = read_table(spark, SF_DIR, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")

    whole = str(tmp_path / "whole")
    build_sketch_store(spark, whole, e)
    want = {r.event_type: r for r in sketch_distinct_over(spark, whole, "2024-01-01", "2024-01-30").collect()}

    split = str(tmp_path / "split")
    build_sketch_store(spark, split, e.filter(day <= F.lit("2024-01-15")))
    append_sketch_days(spark, split, e.filter(day > F.lit("2024-01-15")))
    # OVERLAPPING re-append: days 10-20 land twice; merge-on-read absorbs
    append_sketch_days(
        spark, split, e.filter((day >= F.lit("2024-01-10")) & (day <= F.lit("2024-01-20")))
    )
    got = {r.event_type: r for r in sketch_distinct_over(spark, split, "2024-01-01", "2024-01-30").collect()}
    assert set(got) == set(want)
    for t in want:
        assert got[t].kmv_estimate == want[t].kmv_estimate
        assert got[t].hll_estimate == want[t].hll_estimate


def test_range_read_is_partition_pruned(spark, tmp_path):
    e = read_table(spark, SF_DIR, "events")
    sd = str(tmp_path / "pr")
    build_sketch_store(spark, sd, e)
    days = spark.read.parquet(sd + "/days").filter(
        (F.col("day") >= F.lit("2024-01-05")) & (F.col("day") <= F.lit("2024-01-07"))
    )
    plan = days._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    # the day range reaches the scan as PARTITION filters (directory
    # pruning), not data filters — both bounds present
    assert "day" in pf and ">=" in pf and "<=" in pf
    # (inputFiles() reports the pre-pruning index, so the row-level check
    # is semantic: exactly the 3 requested day directories contribute)
    assert days.select("day").distinct().count() == 3


def test_empty_range_returns_empty(spark, tmp_path):
    e = read_table(spark, SF_DIR, "events")
    sd = str(tmp_path / "er")
    build_sketch_store(spark, sd, e)
    out = sketch_distinct_over(spark, sd, "2030-01-01", "2030-01-31")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "event_type", "kmv_estimate", "hll_estimate",
    ]
