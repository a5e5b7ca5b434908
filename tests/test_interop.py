"""Spark ML UDT interop: operators accept VectorUDT/MatrixUDT columns like
the reference's API (users can switch without rewriting their input prep)."""

import numpy as np

from artan_spark import linalg
from artan_spark.operators import LinearKalmanFilter, RecursiveLeastSquaresFilter


def test_rls_accepts_vector_udt(spark):
    from pyspark.ml.linalg import Vectors

    rng = np.random.RandomState(0)
    n = 40
    x = np.arange(n, dtype=float)
    y = 0.5 * x + 2.0 + rng.normal(0, 1, n)
    df = spark.createDataFrame(
        [(float(y[i]), Vectors.dense([x[i], 1.0])) for i in range(n)], ["label", "features"]
    )
    rls = (
        RecursiveLeastSquaresFilter(2)
        .setInitialEstimate(np.array([1.0, 1.0]))
        .setRegularizationMatrixFactor(10e6)
    )
    state = rls.transform(df).filter(f"stateIndex = {n}").collect()[0].state.mean
    expected = linalg.ols(np.stack([x, np.ones(n)], axis=1), y)
    np.testing.assert_array_almost_equal(np.array(state), expected)


def test_lkf_accepts_udt_measurement_and_matrix(spark):
    from pyspark.ml.linalg import Matrices, Vectors

    rng = np.random.RandomState(0)
    n = 40
    xs = np.arange(n, dtype=float)
    ys = np.sqrt(xs)
    zs = 0.5 * xs - 0.7 * ys + 2.0 + rng.normal(0, 1, n)
    rows = [
        (Vectors.dense([zs[i]]), Matrices.dense(1, 3, [xs[i], ys[i], 1.0]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["measurement", "measurementModel"])
    flt = (
        LinearKalmanFilter(3, 1)
        .setInitialStateCovariance(10.0 * np.eye(3))
        .setMeasurementModelCol("measurementModel")
        .setProcessNoise(np.zeros((3, 3)))
        .setMeasurementNoise(np.array([[1e-4]]))
    )
    mean = np.array(flt.transform(df).filter(f"stateIndex = {n}").collect()[0].state.mean)
    expected = linalg.ols(np.stack([xs, ys, np.ones(n)], axis=1), zs)
    np.testing.assert_array_almost_equal(mean, expected, decimal=3)
