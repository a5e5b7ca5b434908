"""Coverage for the remaining KalmanBase param surface: control inputs,
fading factor, per-row process models, Julier sigma points, EKF noise
Jacobians (reference FilterParams.scala surface)."""

import numpy as np
import pytest

from artan_spark.operators import (
    ExtendedKalmanFilter,
    LinearKalmanFilter,
    UnscentedKalmanFilter,
)
from artan_spark.types import np_to_mat


def test_control_input_shifts_prediction(spark):
    """u + B: constant control drives the state even with no measurements
    (predict-only rows via null measurement)."""
    rows = [("k", None)] * 5
    df = spark.createDataFrame(rows, "key string, measurement array<double>")
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setInitialStateMean(np.zeros(1))
        .setProcessModel(np.eye(1))
        .setProcessNoise(np.zeros((1, 1)))
        .setControl(np.array([2.0]))
        .setControlFunction(np.array([[1.0]]))
    )
    out = sorted(flt.transform(df).collect(), key=lambda r: r.stateIndex)
    means = [r.state.mean[0] for r in out]
    assert means == [2.0, 4.0, 6.0, 8.0, 10.0]


def test_per_row_control_column(spark):
    rows = [("k", None, [1.0]), ("k", None, [10.0]), ("k", None, [100.0])]
    df = spark.createDataFrame(rows, "key string, measurement array<double>, u array<double>")
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setProcessNoise(np.zeros((1, 1)))
        .setControlCol("u")
        .setControlFunction(np.array([[1.0]]))
    )
    out = sorted(flt.transform(df).collect(), key=lambda r: r.stateIndex)
    assert [r.state.mean[0] for r in out] == [1.0, 11.0, 111.0]


def test_fading_factor_inflates_covariance(spark):
    zs = [([1.0],)] * 10
    df = spark.createDataFrame(zs, "measurement array<double>")

    def run(fading):
        flt = (
            LinearKalmanFilter(1, 1)
            .setProcessNoise(np.array([[0.1]]))
            .setMeasurementNoise(np.array([[1.0]]))
            .setFadingFactor(fading)
        )
        rows = sorted(flt.transform(df).collect(), key=lambda r: r.stateIndex)
        return rows[-1].state.covariance.values[0]

    # fading > 1 discounts old data => larger steady-state covariance
    assert run(1.1) > run(1.0)


def test_per_row_process_model(spark):
    """F5 fixture shape (LinearKalmanFilterSpec.scala:234-259): the process
    model arrives per row; the filter must apply each row's F."""
    f2 = np_to_mat(np.array([[2.0]]))
    f3 = np_to_mat(np.array([[3.0]]))
    rows = [("k", None, f2), ("k", None, f3), ("k", None, f2)]
    df = spark.createDataFrame(
        rows,
        "key string, measurement array<double>, "
        "pm struct<numRows:int,numCols:int,values:array<double>>",
    )
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setInitialStateMean(np.array([1.0]))
        .setProcessModelCol("pm")
        .setProcessNoise(np.zeros((1, 1)))
    )
    out = sorted(flt.transform(df).collect(), key=lambda r: r.stateIndex)
    assert [r.state.mean[0] for r in out] == [2.0, 6.0, 12.0]


def test_julier_sigma_points_ols(spark):
    """Julier sampler reaches the same OLS solution (sigmaPoints='julier',
    kappa=1.0 default — UnscentedKalmanFilter.scala:568)."""
    from artan_spark import linalg

    rng = np.random.RandomState(0)
    n = 40
    xs = np.arange(n, dtype=float)
    ys = np.sqrt(xs)
    zs = 0.5 * xs - 0.7 * ys + 2.0 + rng.normal(0, 1, n)
    rows = [("k", [float(zs[i])], np_to_mat(np.array([[xs[i], ys[i], 1.0]]))) for i in range(n)]
    df = spark.createDataFrame(
        rows,
        "stateKey string, measurement array<double>, "
        "measurementModel struct<numRows:int,numCols:int,values:array<double>>",
    )
    flt = (
        UnscentedKalmanFilter(3, 1)
        .setStateKeyCol("stateKey")
        .setInitialStateCovariance(10.0 * np.eye(3))
        .setMeasurementModelCol("measurementModel")
        .setProcessNoise(np.zeros((3, 3)))
        .setMeasurementNoise(np.array([[1e-4]]))
        .setSigmaPoints("julier")
        .setKappa(1.0)
    )
    mean = np.array(flt.transform(df).filter(f"stateIndex = {n}").collect()[0].state.mean)
    expected = linalg.ols(np.stack([xs, ys, np.ones(n)], axis=1), zs)
    assert np.mean(np.abs(mean - expected)) < 1e-3


def _noise_jac(m, R):
    # scales measurement noise by 2 => effective R' = 4R
    return np.array([[2.0]])


def test_ekf_measurement_noise_jacobian(spark):
    """measurementNoiseJacobian: R' = L R L^T changes the gain; with L=2I the
    filter trusts measurements less than the plain EKF."""
    rng = np.random.RandomState(0)
    zs = 5.0 + rng.normal(0, 1, 30)
    df = spark.createDataFrame([([float(z)],) for z in zs], "measurement array<double>")

    def run(with_jac):
        flt = (
            ExtendedKalmanFilter(1, 1)
            .setInitialStateMean(np.zeros(1))
            .setInitialStateCovariance(np.array([[1.0]]))
            .setProcessNoise(np.zeros((1, 1)))
            .setMeasurementNoise(np.array([[1.0]]))
        )
        if with_jac:
            flt = flt.setMeasurementNoiseJacobian(_noise_jac)
        rows = sorted(flt.transform(df).collect(), key=lambda r: r.stateIndex)
        return [r.state.mean[0] for r in rows]

    plain, jac = run(False), run(True)
    # same data, but the jac run converges more slowly (less trust per obs)
    assert abs(jac[2] - 5.0) > abs(plain[2] - 5.0)
    assert abs(jac[-1] - 5.0) < 1.0  # still converges
