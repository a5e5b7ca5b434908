"""Function library tests vs numpy (reference SparkFunctions semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import artan_spark.functions as AF
from artan_spark.types import mat_to_np, np_to_mat


@pytest.fixture(scope="module")
def fdf(spark):
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.array([[0.5, -1.0], [1.5, 2.0]])
    return spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0], np_to_mat(a), np_to_mat(b))],
        "x array<double>, y array<double>, "
        "ma struct<numRows:int,numCols:int,values:array<double>>, "
        "mb struct<numRows:int,numCols:int,values:array<double>>",
    )


def test_constructors(spark):
    row = spark.range(1).select(
        AF.zeros_vector(3).alias("z"),
        AF.ones_vector(2).alias("o"),
        AF.eye_matrix(2).alias("eye"),
        AF.zeros_matrix(2, 3).alias("zm"),
        AF.diag_matrix(F.array(F.lit(2.0), F.lit(5.0))).alias("d"),
    ).collect()[0]
    assert row.z == [0.0, 0.0, 0.0]
    assert row.o == [1.0, 1.0]
    np.testing.assert_array_equal(mat_to_np(row.eye), np.eye(2))
    np.testing.assert_array_equal(mat_to_np(row.zm), np.zeros((2, 3)))  # NOT the reference's ones-bug
    np.testing.assert_array_equal(mat_to_np(row.d), np.diag([2.0, 5.0]))


def test_blas_ops(fdf):
    row = fdf.select(
        AF.dot_vector("x", "y").alias("dot"),
        AF.scal_vector(2.0, "x").alias("scal"),
        AF.axpy_vector(3.0, "x", "y").alias("axpy"),
        AF.outer_product("x", "y").alias("outer"),
    ).collect()[0]
    assert row.dot == pytest.approx(11.0)
    assert row.scal == [2.0, 4.0]
    assert row.axpy == [6.0, 10.0]
    np.testing.assert_array_equal(mat_to_np(row.outer), np.outer([1.0, 2.0], [3.0, 4.0]))


def test_matrix_products(fdf):
    a = np.array([[1.0, 2.0], [3.0, 4.0]])
    b = np.array([[0.5, -1.0], [1.5, 2.0]])
    row = fdf.select(
        AF.multiply_matrix("ma", "mb").alias("ab"),
        AF.multiply_matrix_vector("ma", "x").alias("ax"),
        AF.project_matrix("ma", "mb").alias("bab"),
    ).collect()[0]
    np.testing.assert_allclose(mat_to_np(row.ab), a @ b)
    np.testing.assert_allclose(np.array(row.ax), a @ np.array([1.0, 2.0]))
    np.testing.assert_allclose(mat_to_np(row.bab), b @ a @ b.T)


def test_rand_multi_gaussian(spark):
    mean = np.array([1.0, -2.0])
    cov = np.array([[2.0, 0.8], [0.8, 1.0]])
    df = spark.range(20000).select(AF.rand_multi_gaussian(mean, cov, seed=7).alias("s"))
    samples = np.array(df.collect(), dtype=object)
    samples = np.stack([np.array(r.s) for r in df.collect()])
    np.testing.assert_allclose(samples.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.1)


def test_rand_multi_gaussian_with_col(spark):
    """Column-parameter variant (SparkFunctions.scala:246-258): per-row
    (mean, cov) MVN draws. On constant columns the sample moments must
    recover the same distribution the constant variant draws from, and
    rows with different parameters must follow their own row's mean."""
    mean = np.array([1.0, -2.0])
    cov = np.array([[2.0, 0.8], [0.8, 1.0]])
    base = spark.range(20000).select(
        F.lit(mean.tolist()).cast("array<double>").alias("mu"),
        AF.array_to_matrix(2, 2, F.lit(cov.T.ravel().tolist()).cast("array<double>")).alias("sig"),
    )
    df = base.select(AF.rand_multi_gaussian_with_col("mu", "sig", 2, seed=7).alias("s"))
    samples = np.stack([np.array(r.s) for r in df.collect()])
    np.testing.assert_allclose(samples.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.1)

    # per-row parameters: even ids centered at +10, odd at -10
    mixed = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit([10.0, 10.0]).cast("array<double>"))
        .otherwise(F.lit([-10.0, -10.0]).cast("array<double>"))
        .alias("mu"),
        AF.eye_matrix(2).alias("sig"),
    )
    out = mixed.select(
        "id", AF.rand_multi_gaussian_with_col("mu", "sig", 2, seed=3).alias("s")
    ).collect()
    ev = np.stack([np.array(r.s) for r in out if r.id % 2 == 0])
    od = np.stack([np.array(r.s) for r in out if r.id % 2 == 1])
    np.testing.assert_allclose(ev.mean(axis=0), [10.0, 10.0], atol=0.15)
    np.testing.assert_allclose(od.mean(axis=0), [-10.0, -10.0], atol=0.15)


def test_aggregates(spark):
    df = spark.createDataFrame(
        [(1.0, [1.0, 0.0], np_to_mat(np.eye(2)), 1, -2.0),
         (3.0, [0.0, 1.0], np_to_mat(2 * np.eye(2)), 2, -1.0)],
        "w double, v array<double>, m struct<numRows:int,numCols:int,values:array<double>>, idx long, ll double",
    )
    row = df.agg(
        AF.axpy_vector_aggregate("w", "v", 2).alias("vsum"),
        AF.axpy_matrix_aggregate("w", "m", 2, 2).alias("msum"),
        AF.latest_state_likelihood("ll", "idx", "v").alias("latest"),
    ).collect()[0]
    assert row.vsum == [1.0, 3.0]
    np.testing.assert_array_equal(mat_to_np(row.msum), 7 * np.eye(2))
    assert row.latest.sumLoglikelihood == pytest.approx(-3.0)
    assert row.latest.latestState == [0.0, 1.0]


def test_interop_vector_udt(spark):
    df = spark.createDataFrame([([1.0, 2.0],)], "x array<double>")
    row = df.select(AF.vector_to_array(AF.array_to_vector("x")).alias("rt")).collect()[0]
    assert row.rt == [1.0, 2.0]


def test_mmae_ols(spark):
    """Two identical-model keys; MMAE consensus matches OLS
    (reference test_filters.py:239-270, decimal=0)."""
    from artan_spark.operators import LinearKalmanFilter

    rng = np.random.RandomState(0)
    n = 100
    x = np.concatenate([np.arange(n, dtype=float)] * 2)
    y = 0.27 * x + 1.2 + rng.normal(0, 1, 2 * n)
    keys = ["1"] * n + ["2"] * n
    rows = [
        (keys[i], [float(y[i])], np_to_mat(np.array([[x[i], 1.0]])))
        for i in range(2 * n)
    ]
    df = spark.createDataFrame(
        rows,
        "state_key string, measurement array<double>, "
        "measurementModel struct<numRows:int,numCols:int,values:array<double>>",
    )
    flt = (
        LinearKalmanFilter(2, 1)
        .setStateKeyCol("state_key")
        .setInitialStateMean(np.zeros(2))
        .setInitialStateCovariance(10 * np.eye(2))
        .setMeasurementModelCol("measurementModel")
        .setProcessModel(np.eye(2))
        .setProcessNoise(np.zeros((2, 2)))
        .setMeasurementNoise(np.array([[1.0]]))
        .setSlidingLikelihoodWindow(5)
        .setMultipleModelAdaptiveEstimationEnabled(True)
    )
    out = flt.transform(df)
    state = out.filter(f"stateIndex = {n}").collect()[0].state.mean
    feats = np.stack([x, np.ones(2 * n)], axis=1)
    expected = np.linalg.lstsq(feats, y, rcond=None)[0]
    np.testing.assert_array_almost_equal(np.array(state), expected, decimal=0)
