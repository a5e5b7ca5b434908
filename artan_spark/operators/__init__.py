from artan_spark.operators.asof import StreamingAsofJoin
from artan_spark.operators.kalman import (
    CubatureKalmanFilter,
    ExtendedKalmanFilter,
    LinearKalmanFilter,
    UnscentedKalmanFilter,
)
from artan_spark.operators.lms import LeastMeanSquaresFilter
from artan_spark.operators.mixture import (
    BernoulliMixture,
    MultivariateGaussianMixture,
    PoissonMixture,
)
from artan_spark.operators.rls import RecursiveLeastSquaresFilter
from artan_spark.operators.smoother import LinearKalmanSmoother

__all__ = [
    "LinearKalmanFilter",
    "ExtendedKalmanFilter",
    "UnscentedKalmanFilter",
    "CubatureKalmanFilter",
    "RecursiveLeastSquaresFilter",
    "LeastMeanSquaresFilter",
    "LinearKalmanSmoother",
    "MultivariateGaussianMixture",
    "PoissonMixture",
    "BernoulliMixture",
    "StreamingAsofJoin",
]
