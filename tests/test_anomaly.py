"""Rolling z-score anomaly detection — behavior tests (oracle parity in
test_oracle.py via PYTEST_ORACLES['events_anomaly_zscore'])."""

import datetime as dt

from pyspark.sql import functions as F

from artan_spark.plans.temporal import rolling_zscore


def _events(spark, values, user=1):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (user, i, t0 + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def test_planted_spike_flagged(spark):
    """A flat-ish series with one 50x spike: only the spike clears |z|>=3,
    and its baseline excludes the spike itself."""
    vals = [10.0, 10.1, 9.9, 10.05, 9.95, 10.0, 10.1, 9.9, 500.0, 10.0]
    z = rolling_zscore(_events(spark, vals)).filter(F.abs("z") >= 3.0).collect()
    assert [r["event_id"] for r in z] == [8]
    assert z[0]["z"] > 100  # tiny baseline sigma, huge spike


def test_warmup_rows_unscored(spark):
    """The first min_n rows per key have no baseline and produce no rows."""
    vals = [1.0, 2.0, 1.5, 1.8]  # 4 < min_n=5 baselines available at best
    out = rolling_zscore(_events(spark, vals)).collect()
    assert out == []


def test_constant_baseline_yields_null_z(spark):
    """Zero-variance baseline: z is NULL, never an ANSI error or a flag."""
    vals = [5.0] * 8 + [9.0]
    out = rolling_zscore(_events(spark, vals)).collect()
    assert all(r["z"] is None or r["event_id"] == 8 for r in out)
    spike = [r for r in out if r["event_id"] == 8]
    assert spike and spike[0]["z"] is None  # sd of constant baseline is 0


def test_robust_masks_nothing_under_double_spike(spark):
    """Two equal extreme spikes in a short series: the mean/std baseline is
    inflated by each spike when judging the other (masking), while the
    median/MAD score flags both — the reason the robust variant exists."""
    import artan_spark.plans.temporal as tp

    vals = [10.0, 10.1, 9.9, 10.05, 9.95, 10.0, 400.0, 10.1, 9.9, 400.0, 10.0, 10.05]
    df = _events(spark, vals)
    orig = tp.read_table
    try:
        tp.read_table = lambda _s, _d, _t: df
        robust = tp.events_anomaly_robust(spark, "ignored").collect()
    finally:
        tp.read_table = orig
    assert sorted(r["event_id"] for r in robust) == [6, 9]
    for r in robust:
        assert r["robust_z"] > 3.5


def test_robust_zero_mad_flags_nothing(spark):
    """Majority-constant values: MAD = 0, z NULL (try_divide), no flags —
    never an ANSI error."""
    import artan_spark.plans.temporal as tp

    vals = [5.0] * 9 + [9.0]
    df = _events(spark, vals)
    orig = tp.read_table
    try:
        tp.read_table = lambda _s, _d, _t: df
        out = tp.events_anomaly_robust(spark, "ignored").collect()
    finally:
        tp.read_table = orig
    assert out == []
