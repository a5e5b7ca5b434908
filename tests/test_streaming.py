"""Batch == streaming equivalence — every operator family, rows fed
one-at-a-time in append mode, row-for-row equality with the batch result
(reference testutils/StructuredStreaming.scala:25-58, invoked from every
spec)."""

import numpy as np
import pytest

from artan_spark.operators import (
    LinearKalmanFilter,
    MultivariateGaussianMixture,
    RecursiveLeastSquaresFilter,
)
from artan_spark.streaming import stream_transform
from artan_spark.types import np_to_mat


def _assert_frames_equal(batch_rows, stream_rows, key_fn, value_fn, atol=1e-12):
    assert len(batch_rows) == len(stream_rows)
    b = sorted(batch_rows, key=key_fn)
    s = sorted(stream_rows, key=key_fn)
    for rb, rs in zip(b, s):
        np.testing.assert_allclose(value_fn(rb), value_fn(rs), atol=atol)


@pytest.mark.slow
def test_lkf_batch_stream_equivalence(spark):
    rng = np.random.RandomState(0)
    n = 30
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
        LinearKalmanFilter(3, 1)
        .setStateKeyCol("stateKey")
        .setInitialStateCovariance(10.0 * np.eye(3))
        .setMeasurementModelCol("measurementModel")
        .setProcessNoise(np.zeros((3, 3)))
        .setMeasurementNoise(np.array([[1e-4]]))
    )
    batch = flt.transform(df).collect()
    stream = stream_transform(spark, df, flt.transform).collect()
    _assert_frames_equal(
        batch, stream, lambda r: r.stateIndex, lambda r: np.array(r.state.mean)
    )
    _assert_frames_equal(
        batch,
        stream,
        lambda r: r.stateIndex,
        lambda r: np.array(r.state.covariance["values"] if isinstance(r.state.covariance, dict) else r.state.covariance.values),
    )


@pytest.mark.slow
def test_rls_batch_stream_equivalence(spark):
    rng = np.random.RandomState(0)
    n = 25
    x = np.arange(n, dtype=float)
    y = 0.5 * x + 2.0 + rng.normal(0, 1, n)
    df = spark.createDataFrame(
        [(float(y[i]), [float(x[i]), 1.0]) for i in range(n)], "label double, features array<double>"
    )
    rls = RecursiveLeastSquaresFilter(2).setRegularizationMatrixFactor(10e6)
    batch = rls.transform(df).collect()
    stream = stream_transform(spark, df, rls.transform, chunk_rows=3).collect()
    _assert_frames_equal(batch, stream, lambda r: r.stateIndex, lambda r: np.array(r.state.mean))


@pytest.mark.slow
def test_gmm_batch_stream_equivalence(spark):
    rng = np.random.RandomState(0)
    samples = np.concatenate(
        [rng.multivariate_normal([0.0, 0.0], np.eye(2), 60), rng.multivariate_normal([5.0, 5.0], np.eye(2), 60)]
    )
    rng.shuffle(samples)
    df = spark.createDataFrame([(s.tolist(),) for s in samples], "sample array<double>")
    eye = np.eye(2).ravel().tolist()
    gmm = (
        MultivariateGaussianMixture()
        .setInitialMeans([[1.0, 1.0], [4.0, 4.0]])
        .setInitialCovariances([eye, eye])
        .setMinibatchSize(10)
        .setStepSize(0.1)
    )
    batch = gmm.transform(df).collect()
    stream = stream_transform(spark, df, gmm.transform, chunk_rows=7).collect()
    assert len(batch) == len(stream) == 12
    _assert_frames_equal(
        batch,
        stream,
        lambda r: r.stateIndex,
        lambda r: np.concatenate([np.array(d.mean) for d in r.mixtureModel.distributions]),
    )
