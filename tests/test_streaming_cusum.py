"""StreamingCusum: the O(1)-state recursion replays bit-exactly in plain
Python, micro-batch boundaries cannot show through (stream == its own
batch at two chunkings), the maxima agree with the batch closed-form
operator when fed the same frozen baselines, and degenerate baselines
score NULL without touching state."""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from artan_spark.plans.temporal import CUSUM_K
from artan_spark.sources import read_table
from artan_spark.streaming import StreamingCusum, stream_transform

SF = "/root/testdata/sf0.001"


def _op():
    return (
        StreamingCusum()
        .setStateKeyCol("user_id")
        .setEventTimeCol("ts")
        .setK(CUSUM_K)
        .setH(5.0)
    )


def _with_baselines(spark):
    """events + the per-user FULL-corpus mu/sigma (the frozen reference
    the batch operator derives internally)."""
    e = read_table(spark, SF, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
    )


def _by_id(rows):
    return {r["event_id"]: r for r in rows}


def test_fold_replay_matches_plain_python(spark):
    d = _with_baselines(spark).filter(F.col("user_id") == 1)
    rows = sorted(d.collect(), key=lambda r: (r["ts"], r["event_id"]))
    got = _by_id(_op().transform(d).collect())
    su = sdn = 0.0
    for r in rows:
        su = max(0.0, su + (r["value"] - r["mu"] - CUSUM_K * r["sigma"]) / r["sigma"])
        sdn = max(0.0, sdn + (r["mu"] - CUSUM_K * r["sigma"] - r["value"]) / r["sigma"])
        g = got[r["event_id"]]
        assert g["cusum_up"] == su and g["cusum_down"] == sdn, r["event_id"]
        assert g["alarm_up"] == (su >= 5.0) and g["alarm_down"] == (sdn >= 5.0)


def test_stream_chunk_invariant_and_equals_batch(spark):
    d = _with_baselines(spark).orderBy("ts", "event_id").limit(120)
    batch = _by_id(_op().transform(d).collect())
    for chunk in (7, 31):
        got = _by_id(
            stream_transform(spark, d, lambda df: _op().transform(df), chunk_rows=chunk).collect()
        )
        assert set(got) == set(batch), chunk
        for i in got:
            assert got[i].asDict() == batch[i].asDict(), (chunk, i)


def test_maxima_match_batch_closed_form(spark):
    """max over the recursion == the batch operator's closed-form maxima
    (P_i - min(0, running-min P)) on the same baselines, to float noise."""
    from artan_spark.plans.temporal import events_cusum_drift

    got = (
        _op()
        .transform(_with_baselines(spark))
        .groupBy("stateKey")
        .agg(F.max("cusum_up").alias("mu_up"), F.max("cusum_down").alias("mu_dn"))
        .collect()
    )
    want = {str(r["user_id"]): r for r in events_cusum_drift(spark, SF).collect()}
    assert len(got) == len(want)
    for r in got:
        w = want[r["stateKey"]]
        assert math.isclose(r["mu_up"], w["max_cusum_up"], rel_tol=1e-9, abs_tol=1e-6)
        assert math.isclose(r["mu_dn"], w["max_cusum_down"], rel_tol=1e-9, abs_tol=1e-6)


def test_degenerate_baseline_scores_null_and_preserves_state(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00", 10.0, 5.0, 2.0),
        (1, 2, "2024-01-01 00:01:00", 10.0, 5.0, None),  # null sigma
        (1, 3, "2024-01-01 00:02:00", 10.0, 5.0, 0.0),  # zero sigma
        (1, 4, "2024-01-01 00:03:00", 10.0, 5.0, 2.0),
    ]
    d = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double, mu double, sigma double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = _by_id(_op().transform(d).collect())
    assert got[2]["cusum_up"] is None and got[3]["cusum_down"] is None
    # state carried straight from event 1 to event 4
    s1 = got[1]["cusum_up"]
    expect4 = max(0.0, s1 + (10.0 - 5.0 - CUSUM_K * 2.0) / 2.0)
    assert got[4]["cusum_up"] == expect4
