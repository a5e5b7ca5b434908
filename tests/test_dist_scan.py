"""Distributed (cross-task) parallel-scan LKF engine
(operators/distscan.py): chunk-by-event-time + driver prefix must match
the sequential recursion on every output projection, for any chunk
width, with missing measurements and per-key initial-state overrides —
and its prior-as-element identity must hold exactly."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from artan_spark.operators import LinearKalmanFilter
from artan_spark.operators.vectorized import _scalar_combine

RTOL = 1e-9
T0 = datetime.datetime(2024, 1, 1)


def _flt(**kw):
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("stateKey")
        .setEventTimeCol("ts")
        .setInitialStateMean(np.array([0.0]))
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessModel(np.array([[1.0]]))
        .setMeasurementModel(np.array([[1.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[10.0]]))
        .setVectorizedBatch(True)
        .setCalculateLoglikelihood(True)
        .setCalculateMahalanobis(True)
    )
    for k, v in kw.items():
        flt._set(k, v)
    return flt


def _rows(n_keys, n_rows, missing_every=0, step_s=60):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(n_rows):
        z = None if missing_every and i % missing_every == 3 else [
            float(rng.normal(2.0 * (i % max(n_keys, 1)), 3.0))
        ]
        rows.append(
            (f"k{i % n_keys}", T0 + datetime.timedelta(seconds=step_s * i), z)
        )
    return rows


def _collect(spark, flt, rows):
    df = spark.createDataFrame(
        rows, "stateKey string, ts timestamp, measurement array<double>"
    )
    out = flt.transform(df).select(
        "stateKey",
        "stateIndex",
        "eventTime",
        F.col("state.mean")[0].alias("m"),
        F.col("state.covariance.values")[0].alias("p"),
        F.col("residual.mean")[0].alias("r"),
        F.col("residual.covariance.values")[0].alias("s"),
        "loglikelihood",
        "mahalanobis",
    )
    return {(row.stateKey, row.stateIndex): row for row in out.collect()}


def _assert_parity(seq, dist):
    assert set(seq) == set(dist)
    for k in seq:
        a, b = seq[k], dist[k]
        assert a.eventTime == b.eventTime, k
        np.testing.assert_allclose(b.m, a.m, rtol=RTOL, err_msg=str(k))
        np.testing.assert_allclose(b.p, a.p, rtol=RTOL, err_msg=str(k))
        for fld in ("r", "s", "loglikelihood", "mahalanobis"):
            av, bv = getattr(a, fld), getattr(b, fld)
            if av is None:
                assert bv is None, (k, fld)
            else:
                np.testing.assert_allclose(
                    bv, av, rtol=RTOL, atol=1e-12, err_msg=f"{k} {fld}"
                )


def test_prior_as_element_identity():
    # combine(prior-element, generic-row-element) IS predict+update —
    # the algebraic fact the driver prefix rests on
    f, q, h, r = 0.93, 0.4, 1.6, 0.7
    m0, p0 = 0.3, 5.0
    m, p = m0, p0
    e = (0.0, m0, p0, 0.0, 0.0)
    rng = np.random.RandomState(3)
    for i in range(40):
        z = None if i % 7 == 2 else float(rng.normal(1.0, 2.0))
        # sequential predict + update
        fm, fP = f * m, f * p * f + q
        if z is None:
            m, p = fm, fP
            el = (f, 0.0, q, 0.0, 0.0)
        else:
            S = h * fP * h + r
            K = fP * h / S
            m, p = fm + K * (z - h * fm), fP - K * S * K
            s_g = h * q * h + r
            k_g = q * h / s_g
            el = (
                (1 - k_g * h) * f, k_g * z, (1 - k_g * h) * q,
                f * h * z / s_g, (f * h) * (h * f) / s_g,
            )
        e = _scalar_combine(e, el)
        assert abs(e[1] - m) < 1e-9 * max(1.0, abs(m))
        assert abs(e[2] - p) < 1e-9 * max(1.0, abs(p))


@pytest.mark.parametrize(
    "n_keys,missing,chunk", [(1, 0, "10 minutes"), (4, 0, "15 minutes"), (3, 5, "7 minutes")]
)
def test_distributed_matches_sequential(spark, n_keys, missing, chunk):
    rows = _rows(n_keys, 300, missing_every=missing)
    seq = _collect(spark, _flt(foldEngine="sequential"), rows)
    flt = _flt(foldEngine="distributedScan", scanChunkDuration=chunk)
    dist = _collect(spark, flt, rows)
    assert flt._lastFoldEngine == "distributedScan"
    _assert_parity(seq, dist)


def test_chunk_width_invariance(spark):
    # results must not depend on where chunk boundaries fall
    rows = _rows(2, 200, missing_every=4)
    a = _collect(spark, _flt(foldEngine="distributedScan", scanChunkDuration="5 minutes"), rows)
    b = _collect(spark, _flt(foldEngine="distributedScan", scanChunkDuration="3 hours"), rows)
    _assert_parity(a, b)


def test_single_chunk_degenerates_to_scan(spark):
    # one chunk wide enough for everything == the in-task scan result
    rows = _rows(2, 120)
    dist = _collect(
        spark, _flt(foldEngine="distributedScan", scanChunkDuration="365 days"), rows
    )
    seq = _collect(spark, _flt(foldEngine="sequential"), rows)
    _assert_parity(seq, dist)


def test_initial_state_distribution_col_override(spark):
    # per-key prior on the key's FIRST row; the driver prefix must seed
    # every later chunk from it, not from the param prior
    def dist_cell(mean):
        return {"mean": [mean], "covariance": {"numRows": 1, "numCols": 1, "values": [1.0]}}

    seen = set()
    rows = []
    for i in range(80):
        k = f"k{i % 2}"
        cell = None if k in seen else dist_cell(70.0 if i % 2 else -40.0)
        seen.add(k)
        rows.append((k, T0 + datetime.timedelta(seconds=60 * i), [float(i % 9)], cell))
    df_schema = (
        "stateKey string, ts timestamp, measurement array<double>, "
        "initialStateDistribution struct<mean:array<double>,"
        "covariance:struct<numRows:int,numCols:int,values:array<double>>>"
    )
    df = spark.createDataFrame(rows, df_schema)

    def run(engine):
        flt = _flt(foldEngine=engine, scanChunkDuration="9 minutes")
        flt = flt.setInitialStateDistributionCol("initialStateDistribution")
        out = flt.transform(df).select(
            "stateKey", "stateIndex",
            F.col("state.mean")[0].alias("m"),
            F.col("state.covariance.values")[0].alias("p"),
        )
        return {(r.stateKey, r.stateIndex): (r.m, r.p) for r in out.collect()}

    seq, dist = run("sequential"), run("distributedScan")
    assert set(seq) == set(dist)
    for k in seq:
        np.testing.assert_allclose(dist[k], seq[k], rtol=RTOL, err_msg=str(k))
    # the priors actually took
    assert dist[("k1", 1)][0] > 30 and dist[("k0", 1)][0] < -10


def test_requires_event_time(spark):
    flt = _flt(foldEngine="distributedScan")
    flt._set("eventTimeCol", None)
    df = spark.createDataFrame(
        [("a", [1.0])], "stateKey string, measurement array<double>"
    )
    with pytest.raises(ValueError, match="EventTimeCol"):
        flt.transform(df)


def test_rejects_sliding_likelihood(spark):
    flt = _flt(foldEngine="distributedScan", calculateSlidingLikelihood=True)
    df = spark.createDataFrame(
        [("a", T0, [1.0])], "stateKey string, ts timestamp, measurement array<double>"
    )
    with pytest.raises(ValueError, match="sliding likelihood"):
        flt.transform(df)


@pytest.mark.parametrize("forgetting", [1.0, 0.97])
def test_distributed_rls_matches_sequential(spark, forgetting):
    from artan_spark.operators import RecursiveLeastSquaresFilter

    rng = np.random.RandomState(5)
    rows = [
        (
            f"k{i % 3}",
            T0 + datetime.timedelta(seconds=60 * i),
            float(rng.normal(3.0, 1.5)),
            [float(rng.normal(1.0, 0.3))],
        )
        for i in range(240)
    ]
    df = spark.createDataFrame(
        rows, "stateKey string, ts timestamp, label double, features array<double>"
    )

    def run(engine):
        flt = (
            RecursiveLeastSquaresFilter(1)
            .setStateKeyCol("stateKey")
            .setEventTimeCol("ts")
            .setForgettingFactor(forgetting)
            .setVectorizedBatch(True)
            .setFoldEngine(engine)
        )
        if engine == "distributedScan":
            flt.setScanChunkDuration("11 minutes")
        out = flt.transform(df).select(
            "stateKey", "stateIndex",
            F.col("state.mean")[0].alias("m"),
            F.col("state.covariance.values")[0].alias("p"),
        )
        got = {(r.stateKey, r.stateIndex): (r.m, r.p) for r in out.collect()}
        assert flt._lastFoldEngine == engine
        return got

    seq, dist = run("sequential"), run("distributedScan")
    assert set(seq) == set(dist)
    for k in seq:
        np.testing.assert_allclose(dist[k], seq[k], rtol=RTOL, err_msg=str(k))


def test_distributed_lms_matches_sequential(spark):
    from artan_spark.operators import LeastMeanSquaresFilter

    rng = np.random.RandomState(9)
    rows = [
        (
            f"k{i % 2}",
            T0 + datetime.timedelta(seconds=60 * i),
            float(rng.normal(2.0, 1.0)),
            [float(rng.normal(1.0, 0.5))],
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "stateKey string, ts timestamp, label double, features array<double>"
    )

    def run(engine):
        flt = (
            LeastMeanSquaresFilter()
            .setStateKeyCol("stateKey")
            .setEventTimeCol("ts")
            .setInitialEstimate([0.5])
            .setLearningRate(0.6)
            .setVectorizedBatch(True)
            .setFoldEngine(engine)
        )
        if engine == "distributedScan":
            flt.setScanChunkDuration("13 minutes")
        out = flt.transform(df).select(
            "stateKey", "stateIndex", F.col("state")[0].alias("m")
        )
        got = {(r.stateKey, r.stateIndex): r.m for r in out.collect()}
        assert flt._lastFoldEngine == engine
        return got

    seq, dist = run("sequential"), run("distributedScan")
    assert set(seq) == set(dist)
    for k in seq:
        np.testing.assert_allclose(dist[k], seq[k], rtol=RTOL, err_msg=str(k))


def test_distributed_rls_rejects_nd(spark):
    from artan_spark.operators import RecursiveLeastSquaresFilter

    flt = (
        RecursiveLeastSquaresFilter(2)
        .setStateKeyCol("stateKey")
        .setEventTimeCol("ts")
        .setVectorizedBatch(True)
        .setFoldEngine("distributedScan")
    )
    df = spark.createDataFrame(
        [("a", T0, 1.0, [1.0, 2.0])],
        "stateKey string, ts timestamp, label double, features array<double>",
    )
    with pytest.raises(ValueError, match="scalar"):
        flt.transform(df)


def test_distributed_nd_matches_sequential(spark):
    # 2-state local linear trend, constant H — the n-D matrix-element path
    from artan_spark.operators import LinearKalmanFilter

    rng = np.random.RandomState(13)
    rows = [
        (
            f"k{i % 2}",
            T0 + datetime.timedelta(seconds=60 * i),
            None if i % 9 == 4 else [float(rng.normal(0.1 * i, 2.0))],
        )
        for i in range(220)
    ]
    df = spark.createDataFrame(
        rows, "stateKey string, ts timestamp, measurement array<double>"
    )

    def run(engine):
        flt = (
            LinearKalmanFilter(2, 1)
            .setStateKeyCol("stateKey")
            .setEventTimeCol("ts")
            .setInitialStateMean(np.zeros(2))
            .setInitialStateCovariance(100.0 * np.eye(2))
            .setProcessModel(np.array([[1.0, 1.0], [0.0, 1.0]]))
            .setProcessNoise(np.array([[0.2, 0.0], [0.0, 0.05]]))
            .setMeasurementModel(np.array([[1.0, 0.0]]))
            .setMeasurementNoise(np.array([[8.0]]))
            .setCalculateLoglikelihood(True)
            .setVectorizedBatch(True)
            .setFoldEngine(engine)
        )
        if engine == "distributedScan":
            flt.setScanChunkDuration("17 minutes")
        out = flt.transform(df).select(
            "stateKey", "stateIndex",
            F.col("state.mean").alias("m"),
            F.col("state.covariance.values").alias("p"),
            F.col("residual.mean")[0].alias("r"),
            "loglikelihood",
        )
        got = {(r.stateKey, r.stateIndex): r for r in out.collect()}
        assert flt._lastFoldEngine == engine
        return got

    seq, dist = run("sequential"), run("distributedScan")
    assert set(seq) == set(dist)
    for k in seq:
        a, b = seq[k], dist[k]
        np.testing.assert_allclose(list(b.m), list(a.m), rtol=1e-8, atol=1e-10, err_msg=str(k))
        np.testing.assert_allclose(list(b.p), list(a.p), rtol=1e-8, atol=1e-10, err_msg=str(k))
        if a.r is None:
            assert b.r is None, k
        else:
            np.testing.assert_allclose(b.r, a.r, rtol=1e-8, atol=1e-10, err_msg=str(k))
            np.testing.assert_allclose(
                b.loglikelihood, a.loglikelihood, rtol=1e-8, err_msg=str(k)
            )


def test_distributed_nd_per_row_h_ols(spark):
    # the per-row measurementModel OLS regression shape
    from artan_spark.operators import LinearKalmanFilter

    rng = np.random.RandomState(21)
    beta = np.array([2.0, -1.0, 0.5])
    rows = []
    for i in range(180):
        x = rng.normal(size=3)
        y = float(x @ beta + rng.normal(0, 0.5))
        rows.append(
            (
                f"k{i % 2}",
                T0 + datetime.timedelta(seconds=60 * i),
                [y],
                {"numRows": 1, "numCols": 3, "values": [float(v) for v in x]},
            )
        )
    df = spark.createDataFrame(
        rows,
        "stateKey string, ts timestamp, measurement array<double>, "
        "hrow struct<numRows:int,numCols:int,values:array<double>>",
    )

    def run(engine):
        flt = (
            LinearKalmanFilter(3, 1)
            .setStateKeyCol("stateKey")
            .setEventTimeCol("ts")
            .setInitialStateMean(np.zeros(3))
            .setInitialStateCovariance(10.0 * np.eye(3))
            .setProcessModel(np.eye(3))
            .setProcessNoise(1e-9 * np.eye(3))
            .setMeasurementNoise(np.array([[0.25]]))
            .setMeasurementModelCol("hrow")
            .setVectorizedBatch(True)
            .setFoldEngine(engine)
        )
        if engine == "distributedScan":
            flt.setScanChunkDuration("23 minutes")
        out = flt.transform(df).select(
            "stateKey", "stateIndex", F.col("state.mean").alias("m")
        )
        got = {(r.stateKey, r.stateIndex): list(r.m) for r in out.collect()}
        assert flt._lastFoldEngine == engine
        return got

    seq, dist = run("sequential"), run("distributedScan")
    assert set(seq) == set(dist)
    for k in seq:
        np.testing.assert_allclose(dist[k], seq[k], rtol=1e-7, atol=1e-9, err_msg=str(k))
    # the regression actually converged toward beta
    last = dist[("k0", 90)]
    np.testing.assert_allclose(last, beta, atol=0.5)


def _smoother(lag=7, **kw):
    from artan_spark.operators import LinearKalmanSmoother

    sm = (
        LinearKalmanSmoother(1, 1)
        .setStateKeyCol("stateKey")
        .setEventTimeCol("ts")
        .setInitialStateMean(np.array([0.0]))
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[10.0]]))
        .setFixedLag(lag)
        .setVectorizedBatch(True)
    )
    for k, v in kw.items():
        sm._set(k, v)
    return sm


def _collect_smoothed(spark, sm, rows):
    df = spark.createDataFrame(
        rows, "stateKey string, ts timestamp, measurement array<double>"
    )
    out = sm.transform(df).select(
        "stateKey", "stateIndex", "stepIndex",
        F.col("state.mean")[0].alias("m"),
        F.col("state.covariance.values")[0].alias("p"),
        F.col("rtsGain.values")[0].alias("g"),
        "eventTime",
    )
    return {(r.stateKey, r.stateIndex, r.stepIndex): r for r in out.collect()}


@pytest.mark.parametrize(
    "n_keys,chunk",
    [
        (1, "10 minutes"),
        (3, "15 minutes"),
        # 60 s cadence over 2 keys -> "3 minutes" chunks hold 1-2 rows per
        # key, FAR below lag 7: the overlap targets must reach across
        # SEVERAL predecessor chunks, not just the adjacent one
        (2, "3 minutes"),
    ],
)
def test_distributed_smoother_matches_sequential(spark, n_keys, chunk):
    rows = _rows(n_keys, 260)
    seq = _collect_smoothed(spark, _smoother(foldEngine="sequential"), rows)
    sm = _smoother(foldEngine="distributedScan", scanChunkDuration=chunk)
    dist = _collect_smoothed(spark, sm, rows)
    assert sm._lastFoldEngine == "distributedScan"
    assert set(seq) == set(dist)
    for k in seq:
        a, b = seq[k], dist[k]
        assert a.eventTime == b.eventTime, k
        np.testing.assert_allclose(
            (b.m, b.p, b.g), (a.m, a.p, a.g), rtol=RTOL, atol=1e-12, err_msg=str(k)
        )


def test_distributed_smoother_rejects_fading(spark):
    sm = _smoother(foldEngine="distributedScan", fadingFactor=1.2)
    df = spark.createDataFrame(
        [("a", T0, [1.0])], "stateKey string, ts timestamp, measurement array<double>"
    )
    with pytest.raises(ValueError, match="smoother shape"):
        sm.transform(df)


def test_max_groups_cap(spark):
    rows = _rows(2, 60)
    flt = _flt(
        foldEngine="distributedScan",
        scanChunkDuration="1 minutes",
        distributedScanMaxGroups=5,
    )
    df = spark.createDataFrame(
        rows, "stateKey string, ts timestamp, measurement array<double>"
    )
    with pytest.raises(ValueError, match="groups"):
        flt.transform(df).collect()
