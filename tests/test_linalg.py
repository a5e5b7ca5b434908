"""Spark-free kernel tests (reference test style: closed-form oracles)."""

import math

import numpy as np
import pytest

from artan_spark import linalg


def test_kf_estimate_converges_to_ols():
    # OLS via KF: z = 0.5x - 0.7y + 2 + noise (RegressionTestWrapper.scala:40-65)
    rng = np.random.RandomState(0)
    n = 40
    xs = np.arange(n, dtype=float)
    ys = np.sqrt(xs)
    feats = np.stack([xs, ys, np.ones(n)], axis=1)
    zs = 0.5 * xs - 0.7 * ys + 2.0 + rng.normal(0, 1, n)

    m = np.zeros(3)
    P = 10.0 * np.eye(3)
    F = np.eye(3)
    Q = np.zeros((3, 3))
    R = np.array([[1e-4]])
    for i in range(n):
        m, P = linalg.kf_predict(m, P, F, Q)
        H = feats[i : i + 1]
        m, P, r, S = linalg.kf_estimate(m, P, np.array([zs[i]]), H, R)

    expected = linalg.ols(feats, zs)
    np.testing.assert_allclose(m, expected, atol=1e-3)


def test_rls_converges_to_ols():
    rng = np.random.RandomState(0)
    n = 40
    x = np.arange(n, dtype=float)
    feats = np.stack([x, np.ones(n)], axis=1)
    y = 0.5 * x + 2.0 + rng.normal(0, 1, n)
    m = np.array([1.0, 1.0])
    P = 10e6 * np.eye(2)
    for i in range(n):
        m, P, _ = linalg.rls_update(m, P, y[i], feats[i], 1.0)
    expected = linalg.ols(feats, y)
    np.testing.assert_array_almost_equal(m, expected)


def test_lms_tracks_trend():
    rng = np.random.RandomState(0)
    n = 40
    x = np.arange(n, dtype=float)
    y = 0.2 * x + rng.normal(0, 1, n)
    m = np.array([10.0])
    for i in range(n):
        m = linalg.lms_update(m, y[i], np.array([x[i]]), 1.0, 1.0)
    np.testing.assert_array_almost_equal(m, [0.2], decimal=2)


def test_mvn_logpdf_matches_dense_formula():
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    mean = np.array([1.0, -1.0])
    x = np.array([0.3, 0.7])
    d = x - mean
    expected = -0.5 * (2 * math.log(2 * math.pi) + math.log(np.linalg.det(cov)) + d @ np.linalg.inv(cov) @ d)
    assert linalg.mvn_logpdf(x, mean, cov) == pytest.approx(expected)
    np.testing.assert_allclose(linalg.mvn_logpdf_many(np.stack([x, mean]), mean, cov)[0], expected)


def test_poisson_logpmf_vs_exact():
    # exact: k log r - r - log k!
    for k, r in [(0, 2.0), (3, 2.5), (10, 0.5)]:
        expected = k * math.log(r) - r - math.log(math.factorial(k))
        assert linalg.poisson_logpmf(np.array([k]), r)[0] == pytest.approx(expected)


def test_logsumexp():
    a = np.array([[1.0, 2.0, 3.0], [-1000.0, -1001.0, -1002.0]])
    expected = np.log(np.sum(np.exp(a - a.max(axis=1, keepdims=True)), axis=1)) + a.max(axis=1)
    np.testing.assert_allclose(linalg.logsumexp(a, axis=1), expected)


def test_sigma_points_reconstruct_moments():
    m = np.array([1.0, 2.0])
    P = np.array([[2.0, 0.3], [0.3, 1.0]])
    for pts, wm, wc in [
        linalg.merwe_sigma_points(m, P, 0.3, 2.0, 0.1),
        linalg.julier_sigma_points(m, P, 1.0),
        linalg.cubature_points(m, P),
    ]:
        mean, cov = linalg.unscented_transform(pts, wm, wc, np.zeros((2, 2)))
        np.testing.assert_allclose(mean, m, atol=1e-9)
        np.testing.assert_allclose(cov, P, atol=1e-9)


def test_sqrt_spd():
    a = np.array([[4.0, 1.0], [1.0, 3.0]])
    r = linalg.sqrt_spd(a)
    np.testing.assert_allclose(r @ r, a, atol=1e-10)


def test_jacobi_svd_matches_lapack():
    """The dgesvd-role Jacobi driver reconstructs A = U S Vt and matches
    numpy's gesdd singular values on random square/rect/rank-deficient
    matrices."""
    from artan_spark.linalg import _jacobi_svd

    rng = np.random.RandomState(5)
    mats = [
        rng.normal(size=(4, 4)),
        rng.normal(size=(6, 3)),
        rng.normal(size=(3, 6)),
        np.outer(rng.normal(size=5), rng.normal(size=5)),  # rank 1
        np.zeros((3, 3)),
    ]
    for a in mats:
        u, s, vt = _jacobi_svd(a)
        np.testing.assert_allclose((u * s) @ vt, a, atol=1e-10)
        np.testing.assert_allclose(s, np.linalg.svd(a, compute_uv=False), atol=1e-10)
        nz = s > 1e-12
        ue = u[:, nz]
        np.testing.assert_allclose(ue.T @ ue, np.eye(nz.sum()), atol=1e-10)


def test_selectable_svd_driver_pinv_and_sqrt():
    from artan_spark import linalg

    rng = np.random.RandomState(7)
    a = rng.normal(size=(4, 4))
    spd = a @ a.T + np.eye(4)
    jac = linalg.LinalgOptions("dgesvd", True)
    np.testing.assert_allclose(linalg.pinv(spd, jac), np.linalg.pinv(spd), atol=1e-9)
    r = linalg.sqrt_spd(spd, jac)
    np.testing.assert_allclose(r @ r.T, spd, atol=1e-9)
    # kernels accept the options and agree across drivers
    m = np.zeros(2)
    P = np.eye(2) * 10
    z = np.array([1.0])
    H = np.array([[1.0, 0.0]])
    R = np.array([[2.0]])
    a1 = linalg.kf_estimate(m, P, z, H, R)
    a2 = linalg.kf_estimate(m, P, z, H, R, jac)
    for x, y in zip(a1, a2):
        np.testing.assert_allclose(x, y, atol=1e-10)


def test_options_from_conf_and_validation(spark):
    from artan_spark import linalg

    assert linalg.options_from_conf(spark) == linalg.LinalgOptions("dgesdd", True)
    spark.conf.set("spark.artan.ml.linalg.svdMethod", "dgesvd")
    spark.conf.set("spark.ml.linalg.raiseExceptions", "false")
    try:
        assert linalg.options_from_conf(spark) == linalg.LinalgOptions("dgesvd", False)
        spark.conf.set("spark.artan.ml.linalg.svdMethod", "bogus")
        with pytest.raises(ValueError, match="dgesdd or dgesvd"):
            linalg.options_from_conf(spark)
    finally:
        spark.conf.unset("spark.artan.ml.linalg.svdMethod")
        spark.conf.unset("spark.ml.linalg.raiseExceptions")


def test_lkf_runs_with_dgesvd_driver(spark):
    """End-to-end: the conf-selected Jacobi driver flows plan->fold and
    reproduces the default driver's results on a 2-D model."""
    import numpy as _np

    from artan_spark.operators import LinearKalmanFilter

    rows = [("a", [float(i)]) for i in range(20)]
    df = spark.createDataFrame(rows, "stateKey string, measurement array<double>")

    def run():
        flt = (
            LinearKalmanFilter(2, 1)
            .setStateKeyCol("stateKey")
            .setProcessModel(_np.array([[1.0, 1.0], [0.0, 1.0]]))
            .setMeasurementModel(_np.array([[1.0, 0.0]]))
            .setProcessNoise(0.1 * _np.eye(2))
            .setMeasurementNoise(_np.array([[5.0]]))
        )
        return {
            (r.stateKey, r.stateIndex): np.array(r.state.mean)
            for r in flt.transform(df).collect()
        }

    base = run()
    spark.conf.set("spark.artan.ml.linalg.svdMethod", "dgesvd")
    try:
        alt = run()
    finally:
        spark.conf.unset("spark.artan.ml.linalg.svdMethod")
    assert base.keys() == alt.keys()
    for k in base:
        np.testing.assert_allclose(alt[k], base[k], rtol=1e-8, atol=1e-10)


def test_lag_op_shifts():
    from artan_spark.linalg import lag_op

    L = lag_op(4).toarray()
    x = np.array([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(L @ x, [0.0, 1.0, 2.0, 3.0])
