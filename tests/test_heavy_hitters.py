"""Misra-Gries heavy-hitters sketch: exactness at full capacity is covered
by the PYTEST_ORACLES harness (test_oracle.py); here the BOUNDED-capacity
regime — where decrements actually fire — must still honor the MG error
certificate and never miss a sufficiently heavy item."""

from pyspark.sql import functions as F

from artan_spark.plans.sketch import events_heavy_hitters
from artan_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.01"


def test_bounded_capacity_error_certificate(spark):
    # capacity 16 << 150 distinct users -> decrements fire on every partition
    out = events_heavy_hitters(spark, SF_DIR, capacity=16, k=10).collect()
    assert len(out) == 10
    err = out[0].err_bound
    assert err > 0  # the regime under test: summaries actually truncated
    n_rows = 10_000
    # per-partition decrement <= partition_rows/(capacity+1); summed, the
    # global bound can never exceed total_rows/(capacity+1)
    assert err <= n_rows / (16 + 1)

    truth = {
        str(r.user_id): r.c
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in out:
        # MG invariant survives the merge: f - err <= est <= f
        f = truth[r.user_id]
        assert r.est <= f
        assert r.est >= f - err


def test_full_capacity_is_exact_and_certified_zero(spark):
    out = events_heavy_hitters(spark, SF_DIR, capacity=256, k=5).collect()
    assert all(r.err_bound == 0 for r in out)
    truth = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.col("user_id").cast("string").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("user_id"))
        .limit(5)
        .collect()
    )
    assert [(r.user_id, r.est) for r in out] == [(t.user_id, t.c) for t in truth]
