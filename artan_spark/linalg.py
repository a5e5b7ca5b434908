"""Pure-numpy linear-algebra and probability kernels.

Every stateful operator's per-row math lives here, Spark-free, so it can be
unit-tested against closed-form oracles (np.linalg.lstsq, ground-truth GLM
coefficients) exactly like the reference's test strategy.

Reference parity (semantics only, no code reuse):
- pinv / matrix sqrt via SVD: /root/reference/src/main/scala/com/github/
  ozancicek/artan/ml/linalg/LinalgUtils.scala:161-196
- Mahalanobis via linear solve: LinalgUtils.scala:198-213
- Gaussian logpdf with Cholesky log-det: /root/reference/src/main/scala/com/
  github/ozancicek/artan/ml/stats/MultivariateGaussianDistribution.scala:79-107
- Joseph-form covariance update + pinv gain:
  .../filter/LinearKalmanFilter.scala:204-259
- log-sum-exp responsibilities: .../stats/Distribution.scala:117-127
- Poisson logpmf: reference uses BigIntegerMath.factorial
  (.../stats/PoissonDistribution.scala:51-58); we use lgamma instead
  (documented deviation — overflow-safe, matches to float precision).
"""

from __future__ import annotations

import math

import numpy as np

_LOG2PI = math.log(2.0 * math.pi)
_lgamma_ufunc = np.frompyfunc(math.lgamma, 1, 1)


def gammaln(x: np.ndarray | float) -> np.ndarray:
    """Elementwise log-gamma (no scipy in this environment)."""
    return _lgamma_ufunc(np.asarray(x, dtype=np.float64)).astype(np.float64)


def sym(a: np.ndarray) -> np.ndarray:
    """Symmetrize a nearly-symmetric matrix (guards covariance drift)."""
    return (a + a.T) * 0.5


def pinv(a: np.ndarray) -> np.ndarray:
    """Moore-Penrose pseudo-inverse via SVD (LinalgUtils.scala:161-183)."""
    return np.linalg.pinv(a)


def sqrt_spd(a: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via SVD (LinalgUtils.scala:185-196)."""
    u, s, vt = np.linalg.svd(sym(np.asarray(a, dtype=np.float64)))
    return (u * np.sqrt(np.maximum(s, 0.0))) @ vt


def squared_mahalanobis(r: np.ndarray, cov: np.ndarray) -> float:
    """r^T cov^-1 r via solve; pinv fallback (LinalgUtils.scala:198-213)."""
    r = np.asarray(r, dtype=np.float64).ravel()
    try:
        x = np.linalg.solve(cov, r)
    except np.linalg.LinAlgError:
        x = pinv(cov) @ r
    return float(r @ x)


def mahalanobis(r: np.ndarray, cov: np.ndarray) -> float:
    return math.sqrt(max(squared_mahalanobis(r, cov), 0.0))


def _chol(cov: np.ndarray) -> np.ndarray:
    """Cholesky with escalating jitter for nearly-singular covariances."""
    cov = sym(np.asarray(cov, dtype=np.float64))
    jitter = 0.0
    scale = max(float(np.trace(cov)) / max(cov.shape[0], 1), 1e-300)
    for _ in range(8):
        try:
            return np.linalg.cholesky(cov + jitter * np.eye(cov.shape[0]))
        except np.linalg.LinAlgError:
            jitter = max(jitter * 10.0, 1e-12 * scale)
    raise np.linalg.LinAlgError("covariance not positive definite")


def mvn_logpdf(x: np.ndarray, mean: np.ndarray, cov: np.ndarray) -> float:
    """Multivariate normal logpdf, Cholesky log-det normalizer
    (MultivariateGaussianDistribution.scala:79-107)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    mean = np.asarray(mean, dtype=np.float64).ravel()
    ell = _chol(cov)
    diff = x - mean
    z = np.linalg.solve(ell, diff)
    logdet = 2.0 * float(np.sum(np.log(np.diag(ell))))
    return -0.5 * (len(x) * _LOG2PI + logdet + float(z @ z))


def mvn_logpdf_many(xs: np.ndarray, mean: np.ndarray, cov: np.ndarray) -> np.ndarray:
    """Vectorized MVN logpdf for an (n, d) sample batch."""
    xs = np.atleast_2d(np.asarray(xs, dtype=np.float64))
    mean = np.asarray(mean, dtype=np.float64).ravel()
    ell = _chol(cov)
    diff = xs - mean
    z = np.linalg.solve(ell, diff.T)
    logdet = 2.0 * float(np.sum(np.log(np.diag(ell))))
    return -0.5 * (xs.shape[1] * _LOG2PI + logdet + np.sum(z * z, axis=0))


def poisson_logpmf(k: np.ndarray, rate: float) -> np.ndarray:
    """k·log(rate) − rate − lgamma(k+1); gammaln instead of the reference's
    factorial (PoissonDistribution.scala:51-58) — overflow-safe deviation."""
    k = np.asarray(k, dtype=np.float64)
    if rate <= 0.0:
        return np.where(k == 0.0, 0.0, -np.inf)
    return k * math.log(rate) - rate - gammaln(k + 1.0)


def bernoulli_logpmf(x: np.ndarray, p: float) -> np.ndarray:
    """log p^x (1-p)^(1-x) (BernoulliDistribution.scala:34-36)."""
    x = np.asarray(x, dtype=np.float64)
    eps = 1e-300
    return x * math.log(max(p, eps)) + (1.0 - x) * math.log(max(1.0 - p, eps))


def logsumexp(a: np.ndarray, axis=None) -> np.ndarray:
    """Stable log-sum-exp (Distribution.scala:117-127)."""
    a = np.asarray(a, dtype=np.float64)
    amax = np.max(a, axis=axis, keepdims=True)
    amax = np.where(np.isfinite(amax), amax, 0.0)
    out = np.log(np.sum(np.exp(a - amax), axis=axis, keepdims=True)) + amax
    # axis=None collapses to one element; .reshape(()) then item() avoids the
    # numpy >= 1.25 deprecation of float() on a 0-sized-but-ndim>0 array
    return np.squeeze(out, axis=axis) if axis is not None else float(out.reshape(-1)[0])


# ---------------------------------------------------------------------------
# Kalman-family kernels
# ---------------------------------------------------------------------------


def kf_predict(
    m: np.ndarray,
    P: np.ndarray,
    F: np.ndarray,
    Q: np.ndarray,
    B: np.ndarray | None = None,
    u: np.ndarray | None = None,
    fading: float = 1.0,
):
    """Linear predict step with optional control and fading factor
    (LinearKalmanFilter.scala:168-202)."""
    m1 = F @ m
    if B is not None and u is not None:
        m1 = m1 + B @ u
    P1 = (fading**2) * (F @ P @ F.T) + Q
    return m1, sym(P1)


def kf_estimate(m: np.ndarray, P: np.ndarray, z: np.ndarray, H: np.ndarray, R: np.ndarray):
    """Measurement update: gain via pinv(S), Joseph-form covariance
    (LinearKalmanFilter.scala:204-259).

    Returns (m1, P1, residual, residual_cov).
    """
    r = z - H @ m
    S = sym(H @ P @ H.T + R)
    K = P @ H.T @ pinv(S)
    m1 = m + K @ r
    ikh = np.eye(len(m)) - K @ H
    P1 = ikh @ P @ ikh.T + K @ R @ K.T  # Joseph form
    return m1, sym(P1), r, S


def rls_update(m: np.ndarray, P: np.ndarray, y: float, x: np.ndarray, forgetting: float):
    """Exponentially-weighted recursive least squares rank-1 update
    (RecursiveLeastSquaresFilter.scala:211-242)."""
    Px = P @ x
    denom = forgetting + float(x @ Px)
    gain = Px / denom
    err = y - float(x @ m)
    m1 = m + gain * err
    P1 = (P - np.outer(gain, Px)) / forgetting
    return m1, sym(P1), gain


def lms_update(m: np.ndarray, y: float, x: np.ndarray, learning_rate: float, regularization: float):
    """Normalized LMS step (LeastMeanSquaresFilter.scala:171-190)."""
    err = y - float(x @ m)
    denom = regularization + float(x @ x)
    return m + (learning_rate * err / denom) * x


# --- sigma/cubature point sets ---------------------------------------------


def merwe_sigma_points(m: np.ndarray, P: np.ndarray, alpha: float, beta: float, kappa: float):
    """Van der Merwe scaled sigma points + mean/cov weights
    (UnscentedKalmanFilter.scala:431-472)."""
    n = len(m)
    lam = alpha**2 * (n + kappa) - n
    root = sqrt_spd((n + lam) * P)
    pts = np.empty((2 * n + 1, n))
    pts[0] = m
    pts[1 : n + 1] = m + root
    pts[n + 1 :] = m - root
    wm = np.full(2 * n + 1, 0.5 / (n + lam))
    wc = wm.copy()
    wm[0] = lam / (n + lam)
    wc[0] = lam / (n + lam) + (1.0 - alpha**2 + beta)
    return pts, wm, wc


def julier_sigma_points(m: np.ndarray, P: np.ndarray, kappa: float):
    """Julier sigma points (UnscentedKalmanFilter.scala:393-427)."""
    n = len(m)
    root = sqrt_spd((n + kappa) * P)
    pts = np.empty((2 * n + 1, n))
    pts[0] = m
    pts[1 : n + 1] = m + root
    pts[n + 1 :] = m - root
    wm = np.full(2 * n + 1, 0.5 / (n + kappa))
    wm[0] = kappa / (n + kappa)
    return pts, wm, wm.copy()


def cubature_points(m: np.ndarray, P: np.ndarray):
    """3rd-degree spherical-radial cubature points: 2n symmetric points,
    uniform weights 1/2n (CubatureKalmanFilter.scala:231-279)."""
    n = len(m)
    root = sqrt_spd(float(n) * P)
    pts = np.empty((2 * n, n))
    pts[:n] = m + root
    pts[n:] = m - root
    w = np.full(2 * n, 1.0 / (2 * n))
    return pts, w, w.copy()


def unscented_transform(pts: np.ndarray, wm: np.ndarray, wc: np.ndarray, noise: np.ndarray):
    """Weighted mean/cov of transformed points + additive noise
    (UnscentedKalmanFilter.scala:367-389)."""
    mean = wm @ pts
    diff = pts - mean
    cov = (diff * wc[:, None]).T @ diff + noise
    return mean, sym(cov)


def ols(features: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Least-squares oracle used by tests (mirrors np.linalg.lstsq usage in
    reference tests, test_filters.py:48-75)."""
    return np.linalg.lstsq(np.asarray(features, dtype=np.float64), np.asarray(labels, dtype=np.float64), rcond=None)[0]
