"""Estimation-operator inventory queries over the ``events`` table.

These exercise the SURVEY §2.1 stateful operators end-to-end on driver data.
Most are non-SQL-expressible (recursive matrix state) and rely on the
numpy-oracle pytest layer + rows-only driver checks — EXCEPT the 1-D LMS and
RLS runs, whose scalar recursions ARE encoded as DuckDB recursive CTEs, so
two estimation operators get full value-hash oracles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.operators import (
    CubatureKalmanFilter,
    ExtendedKalmanFilter,
    LeastMeanSquaresFilter,
    LinearKalmanFilter,
    LinearKalmanSmoother,
    MultivariateGaussianMixture,
    PoissonMixture,
    RecursiveLeastSquaresFilter,
    UnscentedKalmanFilter,
)
from artan_spark.sources import read_table

N_KEYS = 32


def _events_measurements(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        (F.col("user_id") % N_KEYS).cast("string").alias("key"),
        F.col("ts"),
        F.col("event_id"),
        F.array(F.col("value")).alias("measurement"),
        F.col("value"),
    )


def _local_level(cls, **extra):
    flt = (
        cls(1, 1)
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialStateMean(np.zeros(1))
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[10.0]]))
    )
    for k, v in extra.items():
        flt._set(k, v)
    return flt


def _finalize(out: DataFrame) -> DataFrame:
    return out.select(
        "stateKey",
        "stateIndex",
        F.round(F.col("state.mean")[0], 6).alias("state_mean"),
        F.round(F.col("state.covariance.values")[0], 6).alias("state_var"),
    )


def _finalize_raw(out: DataFrame) -> DataFrame:
    # raw doubles, no rounding: the 1-D local-level recursion is bit-identical
    # to the DuckDB recursive CTE below (same IEEE op order), and ROUND()
    # implementations disagree exactly at dyadic boundaries
    return out.select(
        "stateKey",
        "stateIndex",
        F.col("state.mean")[0].alias("state_mean"),
        F.col("state.covariance.values")[0].alias("state_var"),
    )


def lkf_events_local_level(spark, sf_dir):
    return _finalize_raw(_local_level(LinearKalmanFilter).transform(_events_measurements(spark, sf_dir)))


def _ident_fn(m, H):
    return H @ m


def _ident_jac(m, H):
    return H


def ekf_events_local_level(spark, sf_dir):
    flt = _local_level(ExtendedKalmanFilter)
    flt.setMeasurementFunction(_ident_fn).setMeasurementStateJacobian(_ident_jac)
    return _finalize_raw(flt.transform(_events_measurements(spark, sf_dir)))


def ukf_events_local_level(spark, sf_dir):
    # default linear fns -> qualifies for the vectorized multi-key sigma
    # fold; bucket count is auto-sized from the (approx) key count
    flt = _local_level(UnscentedKalmanFilter).setVectorizedBatch(True)
    return _finalize(flt.transform(_events_measurements(spark, sf_dir)))


def ckf_events_local_level(spark, sf_dir):
    flt = _local_level(CubatureKalmanFilter).setVectorizedBatch(True)
    return _finalize(flt.transform(_events_measurements(spark, sf_dir)))


def rts_smoother_events(spark, sf_dir):
    sm = (
        LinearKalmanSmoother(1, 1)
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialStateMean(np.zeros(1))
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[10.0]]))
        .setFixedLag(10)
    )
    out = sm.transform(_events_measurements(spark, sf_dir))
    return out.select(
        "stateKey", "stateIndex", "stepIndex", F.round(F.col("state.mean")[0], 6).alias("state_mean")
    )


def mmae_events(spark, sf_dir):
    flt = _local_level(LinearKalmanFilter)
    flt.setSlidingLikelihoodWindow(5).setMultipleModelAdaptiveEstimationEnabled(True)
    out = flt.transform(_events_measurements(spark, sf_dir))
    return out.select("stateIndex", F.round(F.col("state.mean")[0], 4).alias("consensus_mean"))


def gmm_events_value(spark, sf_dir):
    df = _events_measurements(spark, sf_dir).select(F.array(F.col("value")).alias("sample"))
    gmm = (
        MultivariateGaussianMixture()
        .setInitialMeans([[25.0], [75.0]])
        .setInitialCovariances([[100.0], [100.0]])
        .setMinibatchSize(50)
        .setStepSize(0.1)
    )
    out = gmm.transform(df)
    return out.select(
        "stateIndex",
        F.round(F.col("mixtureModel.weights")[0], 6).alias("w0"),
        F.round(F.col("mixtureModel.distributions")[0]["mean"][0], 6).alias("mean0"),
        F.round(F.col("mixtureModel.distributions")[1]["mean"][0], 6).alias("mean1"),
    )


def poisson_mixture_events(spark, sf_dir):
    df = _events_measurements(spark, sf_dir).select((F.col("value") / 10).cast("long").alias("sample"))
    pm = PoissonMixture().setInitialRates([2.0, 8.0]).setMinibatchSize(50).setStepSize(0.1)
    out = pm.transform(df)
    return out.select(
        "stateIndex",
        F.round(F.col("mixtureModel.distributions")[0]["rate"], 6).alias("rate0"),
        F.round(F.col("mixtureModel.distributions")[1]["rate"], 6).alias("rate1"),
    )


def lkf_ols_multikey(spark, sf_dir):
    """3-D online OLS (value ~ hour + sqrt(hour) + 1) per user bucket with a
    per-row measurement model — the n-D many-models workload. Runs the
    vectorized time-synchronous batch fold (operators/vectorized.py)."""
    e = read_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    df = e.select(
        (F.col("user_id") % 512).cast("string").alias("key"),
        F.col("ts"),
        F.array(F.col("value")).alias("measurement"),
        F.struct(
            F.lit(1).alias("numRows"),
            F.lit(3).alias("numCols"),
            F.array(x, F.sqrt(x), F.lit(1.0)).alias("values"),
        ).alias("measurementModel"),
    )
    flt = (
        LinearKalmanFilter(3, 1)
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialStateCovariance(100.0 * np.eye(3))
        .setMeasurementModelCol("measurementModel")
        .setProcessNoise(np.zeros((3, 3)))
        .setMeasurementNoise(np.array([[100.0]]))
        .setVectorizedBatch(True)
    )
    out = flt.transform(df)
    return out.select(
        "stateKey",
        "stateIndex",
        F.round(F.col("state.mean")[0], 6).alias("coef_hour"),
        F.round(F.col("state.mean")[2], 6).alias("intercept"),
    )


# Scalar Kalman recursion for the local-level config (m0=0, P0=100, F=H=1,
# Q=1, R=10, fading=1), mirroring the scalar fold's exact IEEE op order
# (kalman.py _scalar_lkf_fold_factory): P1 = P + 1; S = P1 + 10;
# K = P1*(1/S); m' = m + K*(y-m); P' = ((1-K)*P1)*(1-K) + (K*10)*K (Joseph).
# Bit-identical to BOTH the LKF scalar path and the EKF general numpy path
# (every 1x1 matmul is a single FP op in the same order; pinv(1x1) == 1/S) —
# verified 0 bit-mismatches over sf0.001 and sf0.01. Reference check style:
# LinearKalmanFilterSpec.scala:189-196 (closed-form equivalence).
_KF_1D_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k, value,
         ROW_NUMBER() OVER (PARTITION BY user_id % {N_KEYS} ORDER BY ts, event_id) AS rn
  FROM events
),
rec(k, rn, m, p) AS (
  SELECT k, rn,
         0.0 + (((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0))) * (value - 0.0)),
         ((1.0 - ((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0)))) * (100.0 + 1.0))
             * (1.0 - ((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0))))
           + (((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0))) * 10.0)
             * ((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0)))
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.k, o.rn,
         r.m + (((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0))) * (o.value - r.m)),
         ((1.0 - ((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0)))) * (r.p + 1.0))
             * (1.0 - ((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0))))
           + (((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0))) * 10.0)
             * ((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0)))
  FROM rec r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
)
SELECT k AS stateKey, rn AS stateIndex, m AS state_mean, p AS state_var FROM rec
"""


# -- 1-D LMS / RLS with full recursive-CTE oracles --------------------------


def lms_events_1d(spark, sf_dir):
    """Scalar normalized-LMS over event values per key; SQL-checkable:
    m' = m + (y - m)/2 with lr=reg=1, x=[1]."""
    df = _events_measurements(spark, sf_dir).select(
        "key", "ts", F.col("value").alias("label"), F.array(F.lit(1.0)).alias("features")
    )
    lms = LeastMeanSquaresFilter().setStateKeyCol("key").setEventTimeCol("ts")
    out = lms.transform(df)
    # no rounding: the scalar recursion is bit-identical across engines,
    # and ROUND() implementations disagree exactly at dyadic boundaries
    return out.select("stateKey", "stateIndex", F.col("state")[0].alias("state_mean"))


_LMS_1D_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k, value,
         ROW_NUMBER() OVER (PARTITION BY user_id % {N_KEYS} ORDER BY ts, event_id) AS rn
  FROM events
),
rec(k, rn, m) AS (
  SELECT k, rn, 0.0 + (1.0 * (value - 0.0) / (1.0 + 1.0)) * 1.0 FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.k, o.rn, r.m + (1.0 * (o.value - r.m) / (1.0 + 1.0)) * 1.0
  FROM rec r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
)
SELECT k AS stateKey, rn AS stateIndex, m AS state_mean FROM rec
"""


def rls_events_1d(spark, sf_dir):
    """Scalar RLS (x=[1], forgetting=1, P0=1): running precision-weighted
    mean; the (m, P) recursion is SQL-expressible."""
    df = _events_measurements(spark, sf_dir).select(
        "key", "ts", F.col("value").alias("label"), F.array(F.lit(1.0)).alias("features")
    )
    rls = (
        RecursiveLeastSquaresFilter(1)
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialEstimate(np.zeros(1))
        .setRegularizationMatrix(np.eye(1))
    )
    out = rls.transform(df)
    return out.select(
        "stateKey",
        "stateIndex",
        F.col("state.mean")[0].alias("state_mean"),
        F.col("state.covariance.values")[0].alias("state_cov"),
    )


_RLS_1D_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k, value,
         ROW_NUMBER() OVER (PARTITION BY user_id % {N_KEYS} ORDER BY ts, event_id) AS rn
  FROM events
),
rec(k, rn, m, p) AS (
  SELECT k, rn,
         0.0 + (1.0 / (1.0 + 1.0)) * (value - 0.0),
         (1.0 - (1.0 / (1.0 + 1.0)) * 1.0) / 1.0
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.k, o.rn,
         r.m + (r.p / (1.0 + r.p)) * (o.value - r.m),
         (r.p - (r.p / (1.0 + r.p)) * r.p) / 1.0
  FROM rec r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
)
SELECT k AS stateKey, rn AS stateIndex, m AS state_mean, p AS state_cov
FROM rec
"""


QUERIES = {
    "lkf_events_local_level": lkf_events_local_level,
    "ekf_events_local_level": ekf_events_local_level,
    "ukf_events_local_level": ukf_events_local_level,
    "ckf_events_local_level": ckf_events_local_level,
    "rts_smoother_events": rts_smoother_events,
    "mmae_events": mmae_events,
    "lkf_ols_multikey": lkf_ols_multikey,
    "gmm_events_value": gmm_events_value,
    "poisson_mixture_events": poisson_mixture_events,
    "lms_events_1d": lms_events_1d,
    "rls_events_1d": rls_events_1d,
}

# only the scalar recursions are SQL-expressible; the rest are rows-only
ORACLES = {
    "lkf_events_local_level": _KF_1D_SQL,
    "ekf_events_local_level": _KF_1D_SQL,
    "lms_events_1d": _LMS_1D_SQL,
    "rls_events_1d": _RLS_1D_SQL,
}
