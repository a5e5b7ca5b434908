"""Rolling z-score anomaly detection — behavior tests (oracle parity in
test_oracle.py via PYTEST_ORACLES['events_anomaly_zscore'])."""

import datetime as dt

import pytest

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


def test_cusum_closed_form_matches_recursion(spark):
    """The two-window closed form equals the textbook CUSUM recursion
    S_i = max(0, S_{i-1} + d_i) replayed in plain Python, and a planted
    mean shift raises the alarm (both directions: the full-sample mean
    splits the shift between head and tail)."""
    import numpy as np

    import artan_spark.plans.temporal as tp

    rng = np.random.default_rng(13)
    vals = list(10 + 0.5 * rng.standard_normal(40)) + list(
        11.5 + 0.5 * rng.standard_normal(40)
    )
    df = _events(spark, vals)
    orig = tp.read_table
    try:
        tp.read_table = lambda _s, _d, _t: df
        [row] = tp.events_cusum_drift(spark, "ignored").collect()
    finally:
        tp.read_table = orig

    a = np.asarray(vals, dtype=float)
    mu, sd = a.mean(), a.std(ddof=1)
    su = sp = 0.0
    max_up = max_dn = 0.0
    for v in a:
        su = max(0.0, su + (v - mu - tp.CUSUM_K * sd) / sd)
        sp = max(0.0, sp + (mu - tp.CUSUM_K * sd - v) / sd)
        max_up, max_dn = max(max_up, su), max(max_dn, sp)
    assert row["max_cusum_up"] == pytest.approx(max_up, abs=1e-6)
    assert row["max_cusum_down"] == pytest.approx(max_dn, abs=1e-6)
    # with the full-sample mean baseline a mean SHIFT drifts both ways:
    # the pre-shift head sits below mu, the post-shift tail above, so both
    # alarms fire — the changepoint seen from both sides
    assert row["alarm_up"] and row["alarm_down"]
    assert row["n_events"] == len(vals)


def test_cusum_stationary_series_stays_quiet(spark):
    import numpy as np

    import artan_spark.plans.temporal as tp

    rng = np.random.default_rng(17)
    vals = list(5 + rng.standard_normal(120))
    df = _events(spark, vals)
    orig = tp.read_table
    try:
        tp.read_table = lambda _s, _d, _t: df
        [row] = tp.events_cusum_drift(spark, "ignored").collect()
    finally:
        tp.read_table = orig
    assert not row["alarm_up"] and not row["alarm_down"]
