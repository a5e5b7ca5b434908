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
    BernoulliMixture,
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
    # 4dp: the sigma-point filters on a linear model track the exact KF
    # recursion to ~3e-12 abs while the exact values sit ≥8e-9 from the
    # nearest 4dp rounding boundary (measured at sf0.001/sf0.01, ≥3100x
    # margin) — so rounding both sides to 4dp is hash-stable cross-engine
    return out.select(
        "stateKey",
        "stateIndex",
        F.round(F.col("state.mean")[0], 4).alias("state_mean"),
        F.round(F.col("state.covariance.values")[0], 4).alias("state_var"),
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
    # DEFAULT-ENGINE entry: foldEngine="auto" resolves this constant-model
    # scalar shape to the PARALLEL-SCAN fold (kalman.py _scanEligible) —
    # the driver gate pins the scan engine itself. The scan's float op
    # order differs from the CTE recursion (~1e-15 rel measured at sf0.01),
    # so the oracle is the exact recursion rounded to 4dp
    # (_KF_1D_ROUNDED_SQL, same scheme as UKF/CKF); the margin is guarded
    # by tests/test_oracle_margins.py. The bit-exact raw-double pins live
    # on the sequential engine entries (lkf_events_streamed, ekf, lms).
    flt = _local_level(LinearKalmanFilter)
    out = _finalize(flt.transform(_events_measurements(spark, sf_dir)))
    if flt._lastFoldEngine != "scan":  # pragma: no cover - contract guard
        raise AssertionError("auto engine did not resolve to the scan fold")
    return out


def rts_smoother_distscan(spark, sf_dir):
    # DISTRIBUTED-SMOOTHER entry: the 3-pass chunk-overlap engine
    # (operators/distscan.py distributed_smoother_transform) against the
    # same 4dp-rounded forward+backward CTE as the windowed entry. "2 days"
    # chunks hold ~20 rows/key at sf0.001 — BELOW the lag of 10 only
    # rarely, but the margin case in test_oracle_margins runs both gate
    # SFs; cross-chunk borrowing is exercised at every seam.
    sm = (
        LinearKalmanSmoother(1, 1)
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialStateMean(np.zeros(1))
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[10.0]]))
        .setFixedLag(SMOOTHER_LAG)
        .setVectorizedBatch(True)
        .setFoldEngine("distributedScan")
        .setScanChunkDuration("2 days")
    )
    out = sm.transform(_events_measurements(spark, sf_dir))
    if sm._lastFoldEngine != "distributedScan":  # pragma: no cover - contract guard
        raise AssertionError("distributedScan smoother did not execute")
    return out.select(
        "stateKey",
        "stateIndex",
        "stepIndex",
        F.round(F.col("state.mean")[0], 4).alias("state_mean"),
    )


def lkf_events_distscan(spark, sf_dir):
    # DISTRIBUTED-SCAN entry: the same local-level model and 4dp-rounded
    # recursive-CTE oracle as lkf_events_local_level, executed by the
    # cross-task engine (operators/distscan.py): chunk-by-event-time,
    # per-chunk element combine, driver prefix, seeded finalize — one hot
    # key spans many tasks. Engine parity vs the in-task scan is ~1e-15
    # rel (same element algebra, different association order), so the
    # audited 4dp margins carry over unchanged. "2 days" over the events
    # table's 30-day span forces ~15 chunks per key — every cross-chunk
    # seam is exercised, not just the degenerate one-chunk case.
    flt = _local_level(LinearKalmanFilter).setVectorizedBatch(True)
    flt.setFoldEngine("distributedScan").setScanChunkDuration("2 days")
    out = _finalize(flt.transform(_events_measurements(spark, sf_dir)))
    if flt._lastFoldEngine != "distributedScan":  # pragma: no cover - contract guard
        raise AssertionError("distributedScan engine did not execute")
    return out


def _ident_fn(m, H):
    # shape-polymorphic (the batched-callable contract): the sequential
    # fold passes one (n,) state, the vectorized fold the whole (A, n)
    # step batch — same doubles either way (row i of m @ H.T == H @ m_i)
    m = np.asarray(m, dtype=np.float64)
    if m.ndim == 2:
        return m @ H.T
    return H @ m


def _ident_jac(m, H):
    m = np.asarray(m, dtype=np.float64)
    if m.ndim == 2:
        return np.broadcast_to(H, (m.shape[0],) + H.shape)
    return H


def ekf_events_local_level(spark, sf_dir):
    # the vectorized EKF fold calls the user fns once per TIME STEP on the
    # whole key batch (batched-callable contract, opted in via
    # setVectorizedFunctions) and is bit-identical to the sequential fold
    # on this 1-D shape (test_vectorized_ekf_bit_exact), so the raw-double
    # recursive-CTE oracle hash is unchanged
    flt = _local_level(ExtendedKalmanFilter).setVectorizedBatch(True)
    flt.setVectorizedFunctions(True)
    flt.setMeasurementFunction(_ident_fn).setMeasurementStateJacobian(_ident_jac)
    out = _finalize_raw(flt.transform(_events_measurements(spark, sf_dir)))
    if not flt._lastFoldVectorized:  # pragma: no cover - contract guard
        raise AssertionError("EKF entry fell back to the base sequential fold")
    return out


def ukf_events_local_level(spark, sf_dir):
    # default linear fns -> qualifies for the vectorized multi-key sigma
    # fold; bucket count is auto-sized from the (approx) key count
    flt = _local_level(UnscentedKalmanFilter).setVectorizedBatch(True)
    out = _finalize(flt.transform(_events_measurements(spark, sf_dir)))
    if not flt._lastFoldVectorized:  # pragma: no cover - contract guard
        raise AssertionError("UKF entry fell back to the base sequential fold")
    return out


def ckf_events_local_level(spark, sf_dir):
    flt = _local_level(CubatureKalmanFilter).setVectorizedBatch(True)
    out = _finalize(flt.transform(_events_measurements(spark, sf_dir)))
    if not flt._lastFoldVectorized:  # pragma: no cover - contract guard
        raise AssertionError("CKF entry fell back to the base sequential fold")
    return out


SMOOTHER_LAG = 10


def rts_smoother_events(spark, sf_dir):
    sm = (
        LinearKalmanSmoother(1, 1)
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialStateMean(np.zeros(1))
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[10.0]]))
        .setFixedLag(SMOOTHER_LAG)
        .setVectorizedBatch(True)
    )
    out = sm.transform(_events_measurements(spark, sf_dir))
    # DEFAULT-ENGINE entry: auto resolves this scalar constant-model shape
    # to the parallel-scan smoother (forward scan + anchor-vectorized
    # backward window). Scan float op order differs from the CTE (~1e-15
    # rel at sf0.01), so the oracle rounds to 4dp
    # (_SMOOTHER_1D_ROUNDED_SQL); margin guarded in test_oracle_margins.py.
    if sm._lastFoldEngine != "scan":  # pragma: no cover - contract guard
        raise AssertionError("auto engine did not resolve to the scan fold")
    return out.select(
        "stateKey",
        "stateIndex",
        "stepIndex",
        F.round(F.col("state.mean")[0], 4).alias("state_mean"),
    )


def mmae_events(spark, sf_dir):
    # Auto engine: this scalar constant-model shape (with the sliding
    # likelihood MMAE forces) resolves to the parallel-scan fold, which
    # removes the rows-per-key serial bound that made this entry the
    # r7-r11 sf1.0 watch item (33 keys x ~30k rows/key at sf0.1 was the
    # sequential fold's worst case). The 4dp consensus rounding absorbs
    # the scan's float-order noise (deviation 0 after rounding at sf0.01;
    # margin guarded by test_mmae_oracle_margin).
    flt = _local_level(LinearKalmanFilter)
    flt.setSlidingLikelihoodWindow(5).setMultipleModelAdaptiveEstimationEnabled(True)
    out = flt.transform(_events_measurements(spark, sf_dir))
    return out.select("stateIndex", F.round(F.col("state.mean")[0], 4).alias("consensus_mean"))


def gmm_events_value(spark, sf_dir):
    """Per-key online Gaussian mixture (k=2, 1-D) over event values with
    minibatchSize=1 — every row is its own stochastic-EM step, which makes
    the whole recursion scalar and SQL-expressible (``_GMM_1D_SQL``). The
    model is always the derived form of the scaled sufficient stats
    (updateHoldout=0), so the oracle carries just (sw, sm, sc) per component.
    Parity: MixtureBase.scala stochastic E/M cycle; rounding margin guarded
    by tests/test_oracle_margins.py."""
    df = _events_measurements(spark, sf_dir).select(
        "key", "ts", F.array(F.col("value")).alias("sample")
    )
    gmm = (
        MultivariateGaussianMixture()
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialMeans([[25.0], [75.0]])
        .setInitialCovariances([[100.0], [100.0]])
        .setMinibatchSize(1)
        .setStepSize(0.1)
        .setVectorizedBatch(True)
    )
    out = gmm.transform(df)
    return out.select(
        "stateKey",
        "stateIndex",
        F.round(F.col("mixtureModel.weights")[0], 5).alias("w0"),
        F.round(F.col("mixtureModel.distributions")[0]["mean"][0], 5).alias("mean0"),
        F.round(F.col("mixtureModel.distributions")[1]["mean"][0], 5).alias("mean1"),
    )


def poisson_mixture_events(spark, sf_dir):
    """Per-key online Poisson mixture (k=2) with minibatchSize=1; same
    SQL-expressible scalar recursion story as ``gmm_events_value`` (the
    gammaln(x+1) term cancels inside the responsibility softmax)."""
    df = _events_measurements(spark, sf_dir).select(
        # F.floor (not a bare long cast, which truncates toward zero) so the
        # sample agrees with the oracle's FLOOR for negative values too
        "key", "ts", F.floor(F.col("value") / 10).cast("long").alias("sample")
    )
    pm = (
        PoissonMixture()
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialRates([2.0, 8.0])
        .setMinibatchSize(1)
        .setStepSize(0.1)
        .setVectorizedBatch(True)
    )
    out = pm.transform(df)
    return out.select(
        "stateKey",
        "stateIndex",
        F.round(F.col("mixtureModel.weights")[0], 5).alias("w0"),
        F.round(F.col("mixtureModel.distributions")[0]["rate"], 5).alias("rate0"),
        F.round(F.col("mixtureModel.distributions")[1]["rate"], 5).alias("rate1"),
    )


def bernoulli_mixture_events(spark, sf_dir):
    """Per-key online Bernoulli mixture (k=2) over the indicator
    ``value > 5`` with minibatchSize=1 — the same scalar stochastic-EM
    recursion as ``poisson_mixture_events``, so it is SQL-expressible
    (``_BERNOULLI_MIX_SQL``). Parity: BernoulliMixture.scala:38-160."""
    df = _events_measurements(spark, sf_dir).select(
        "key", "ts", (F.col("value") > 5).cast("double").alias("sample")
    )
    bm = (
        BernoulliMixture()
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setInitialProbabilities([0.2, 0.8])
        .setMinibatchSize(1)
        .setStepSize(0.1)
        .setVectorizedBatch(True)
    )
    out = bm.transform(df)
    return out.select(
        "stateKey",
        "stateIndex",
        F.round(F.col("mixtureModel.weights")[0], 5).alias("w0"),
        F.round(F.col("mixtureModel.distributions")[0]["probability"], 5).alias("p0"),
        F.round(F.col("mixtureModel.distributions")[1]["probability"], 5).alias("p1"),
    )


def gmm_batch_em_events(spark, sf_dir):
    """Per-key BATCH EM (``batchTrainEnabled``): the driver-side loop of
    ``FiniteMixtureBase._batchEM`` — each iteration runs the stateful pass
    with minibatch = the full key count (ONE EM update per key per pass),
    takes the final model, and rebinds it as the next pass's initial model
    via ``initialMixtureModelCol``. Pinned at exactly TWO iterations
    (``batchTrainTol=-inf`` disables early stop) so the oracle's depth is
    fixed: two plain aggregation levels in SQL, no recursion — the E-step
    responsibilities come from the current model, the M-step is the
    stepSize-blended batch-mean sufficient stats (mixture.py
    ``_mixture_fold_factory``), identical to the minibatch-1 recursion's
    algebra with the per-sample stat replaced by the batch AVG. Rounded to
    5dp like the online-mixture oracles (engine sum orders differ ~1e-13;
    margin guarded in test_oracle_margins.py)."""
    df = _events_measurements(spark, sf_dir).select(
        "key", F.array(F.col("value")).alias("sample")
    )
    gmm = (
        MultivariateGaussianMixture()
        .setStateKeyCol("key")
        .setInitialMeans([[25.0], [75.0]])
        .setInitialCovariances([[100.0], [100.0]])
        .setStepSize(0.1)
        .setBatchTrainEnabled(True)
        .setBatchTrainMaxIter(2)
        .setBatchTrainTol(float("-inf"))
    )
    out = gmm.transform(df)
    return out.select(
        "stateKey",
        F.round(F.col("mixtureModel.weights")[0], 5).alias("w0"),
        F.round(F.col("mixtureModel.distributions")[0]["mean"][0], 5).alias("mean0"),
        F.round(F.col("mixtureModel.distributions")[1]["mean"][0], 5).alias("mean1"),
        F.round(F.col("mixtureModel.distributions")[0]["covariance"]["values"][0], 5).alias("var0"),
        F.round(F.col("mixtureModel.distributions")[1]["covariance"]["values"][0], 5).alias("var1"),
    )


# Batch EM, 2 fixed iterations: each level computes per-sample
# responsibilities under the CURRENT model, then the alpha-blended
# batch-mean sufficient stats (sw' = .9 sw + .1 AVG(resp);
# sm' = .9 sm + .1 AVG(resp*x); sc' = .9 sc + .1 AVG(resp*(x-m)^2) with m
# the current derived mean), then derives (w, m, v) = (sw, sm/sw, sc/sw).
# Iteration 2's init stats mirror the rebind exactly: scal(params, w) =
# (w*m, w*v), not the raw (sm, sc) — one float rounding apart.
_GMM_BATCH_EM_SQL = f"""
WITH samp AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k, value AS x FROM events
),
e1 AS (
  SELECT k, x,
         -0.5 * (ln(2.0 * pi()) + ln(100.0) + ((x - 25.0) * (x - 25.0)) / 100.0)
           + ln(0.5) AS l0,
         -0.5 * (ln(2.0 * pi()) + ln(100.0) + ((x - 75.0) * (x - 75.0)) / 100.0)
           + ln(0.5) AS l1
  FROM samp
),
r1 AS (
  SELECT k, x,
         exp(l0 - greatest(l0, l1)) / (exp(l0 - greatest(l0, l1)) + exp(l1 - greatest(l0, l1))) AS p0,
         exp(l1 - greatest(l0, l1)) / (exp(l0 - greatest(l0, l1)) + exp(l1 - greatest(l0, l1))) AS p1
  FROM e1
),
a1 AS (
  SELECT k, AVG(p0) AS rw0, AVG(p1) AS rw1,
         AVG(p0 * x) AS rm0, AVG(p1 * x) AS rm1,
         AVG(p0 * (x - 25.0) * (x - 25.0)) AS rc0,
         AVG(p1 * (x - 75.0) * (x - 75.0)) AS rc1
  FROM r1 GROUP BY k
),
m1 AS (
  SELECT k,
         0.9 * 0.5 + 0.1 * rw0 AS sw0, 0.9 * 0.5 + 0.1 * rw1 AS sw1,
         0.9 * 12.5 + 0.1 * rm0 AS sm0, 0.9 * 37.5 + 0.1 * rm1 AS sm1,
         0.9 * 50.0 + 0.1 * rc0 AS sc0, 0.9 * 50.0 + 0.1 * rc1 AS sc1
  FROM a1
),
d1 AS (
  SELECT k, sw0 AS w0, sw1 AS w1,
         sm0 / sw0 AS m0, sm1 / sw1 AS m1,
         sc0 / sw0 AS v0, sc1 / sw1 AS v1
  FROM m1
),
e2 AS (
  SELECT s.k, s.x, d.w0, d.w1, d.m0, d.m1, d.v0, d.v1,
         -0.5 * (ln(2.0 * pi()) + ln(d.v0) + ((s.x - d.m0) * (s.x - d.m0)) / d.v0)
           + ln(d.w0) AS l0,
         -0.5 * (ln(2.0 * pi()) + ln(d.v1) + ((s.x - d.m1) * (s.x - d.m1)) / d.v1)
           + ln(d.w1) AS l1
  FROM samp s JOIN d1 d ON d.k = s.k
),
r2 AS (
  SELECT k, x, w0, w1, m0, m1, v0, v1,
         exp(l0 - greatest(l0, l1)) / (exp(l0 - greatest(l0, l1)) + exp(l1 - greatest(l0, l1))) AS p0,
         exp(l1 - greatest(l0, l1)) / (exp(l0 - greatest(l0, l1)) + exp(l1 - greatest(l0, l1))) AS p1
  FROM e2
),
a2b AS (
  SELECT r.k, AVG(r.p0) AS rw0, AVG(r.p1) AS rw1,
         AVG(r.p0 * r.x) AS rm0, AVG(r.p1 * r.x) AS rm1,
         AVG(r.p0 * (r.x - r.m0) * (r.x - r.m0)) AS rc0,
         AVG(r.p1 * (r.x - r.m1) * (r.x - r.m1)) AS rc1,
         MIN(r.w0) AS w0, MIN(r.w1) AS w1, MIN(r.m0) AS m0, MIN(r.m1) AS m1,
         MIN(r.v0) AS v0, MIN(r.v1) AS v1
  FROM r2 r GROUP BY r.k
),
m2 AS (
  SELECT k,
         0.9 * w0 + 0.1 * rw0 AS sw0, 0.9 * w1 + 0.1 * rw1 AS sw1,
         0.9 * (w0 * m0) + 0.1 * rm0 AS sm0, 0.9 * (w1 * m1) + 0.1 * rm1 AS sm1,
         0.9 * (w0 * v0) + 0.1 * rc0 AS sc0, 0.9 * (w1 * v1) + 0.1 * rc1 AS sc1
  FROM a2b
)
SELECT k AS stateKey,
       ROUND(sw0, 5) AS w0,
       ROUND(sm0 / sw0, 5) AS mean0, ROUND(sm1 / sw1, 5) AS mean1,
       ROUND(sc0 / sw0, 5) AS var0, ROUND(sc1 / sw1, 5) AS var1
FROM m2
"""


def lkf_ols_multikey(spark, sf_dir):
    """3-D online OLS (value ~ hour + sqrt(hour + 0.5) + 1) per user bucket
    with a per-row measurement model — the n-D many-models workload. Runs the
    vectorized time-synchronous batch fold (operators/vectorized.py).

    The half-integer offset inside the sqrt keeps the regressor irrational
    for every integer hour (b^2*(2h+1) = 2a^2 has no integer solutions), so
    the Kalman gains are non-dyadic from step 1 and no recursion value lands
    exactly on a decimal rounding boundary — with a plain sqrt(hour), hour-0
    rows give K = 0.5 exactly and the 2-decimal `value` inputs produce
    boundary-exact outputs where cross-engine ROUND() diverges. 4dp margin
    measured >=2700x at sf0.01; guarded by tests/test_oracle_margins.py."""
    e = read_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    df = e.select(
        (F.col("user_id") % 512).cast("string").alias("key"),
        F.col("ts"),
        F.array(F.col("value")).alias("measurement"),
        F.struct(
            F.lit(1).alias("numRows"),
            F.lit(3).alias("numCols"),
            F.array(x, F.sqrt(x + F.lit(0.5)), F.lit(1.0)).alias("values"),
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
        F.round(F.col("state.mean")[0], 4).alias("coef_hour"),
        F.round(F.col("state.mean")[2], 4).alias("intercept"),
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


# Sigma-point filters (UKF/CKF) on a linear model reproduce the exact KF
# recursion up to sigma-arithmetic float noise (measured ≤2.7e-12 abs at
# sf0.01) — orders of magnitude inside the 4dp rounding margin (min distance
# of the exact values to a 4dp boundary: 8.3e-9). So their oracle is the
# exact recursion, rounded. tests/test_oracle_margins.py guards the margin.
_KF_1D_ROUNDED_SQL = f"""
SELECT stateKey, stateIndex,
       ROUND(state_mean, 4) AS state_mean,
       ROUND(state_var, 4) AS state_var
FROM ({_KF_1D_SQL})
"""


# Fixed-lag RTS smoother, 1-D local level: forward pass is the _KF_1D_SQL
# recursion; the backward pass mirrors the scalar smoother fold's exact IEEE
# op order (smoother.py _scalar_smoother_fold_factory:129-138): with F=1,
# fading=1: nc = P_j + 1; g = P_j*(1/nc); sm' = m_j + g*(sm - m_j);
# smP' = P_j + (g*(smP - nc))*g. Multiplications by f=h=1.0 are IEEE-exact,
# so raw doubles are bit-identical — verified 0 mismatches at sf0.001/sf0.01.
# Anchors exist once the per-key queue holds `lag` entries (rn >= lag); each
# anchor emits steps 0..lag-1 with stateIndex = anchor - step.
_SMOOTHER_1D_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k, value,
         ROW_NUMBER() OVER (PARTITION BY user_id % {N_KEYS} ORDER BY ts, event_id) AS rn
  FROM events
),
fwd(k, rn, m, p) AS (
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
  FROM fwd r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
),
back(k, anchor, step, sm_m, sm_p) AS (
  SELECT k, rn, 0, m, p FROM fwd WHERE rn >= {SMOOTHER_LAG}
  UNION ALL
  SELECT b.k, b.anchor, b.step + 1,
         f.m + ((f.p * (1.0 / (f.p + 1.0))) * (b.sm_m - f.m)),
         f.p + ((f.p * (1.0 / (f.p + 1.0))) * (b.sm_p - (f.p + 1.0)))
             * (f.p * (1.0 / (f.p + 1.0)))
  FROM back b JOIN fwd f ON f.k = b.k AND f.rn = b.anchor - (b.step + 1)
  WHERE b.step + 1 <= {SMOOTHER_LAG - 1}
)
SELECT k AS stateKey, anchor - step AS stateIndex, step AS stepIndex, sm_m AS state_mean
FROM back
"""


# auto engine runs the parallel-scan smoother (~1e-15 rel vs the exact
# recursion at sf0.01) -> compare the rounded projection; margin guarded by
# tests/test_oracle_margins.py
_SMOOTHER_1D_ROUNDED_SQL = f"""
SELECT stateKey, stateIndex, stepIndex,
       ROUND(state_mean, 4) AS state_mean
FROM ({_SMOOTHER_1D_SQL})
"""


# MMAE consensus, 1-D local level across the key bank: forward recursion +
# per-row loglikelihood (kalman.py _scalar_lkf_fold_factory:212-219:
# ll = -0.5*(log2pi + 2*log(sqrt(S)) + (r/sqrt(S))^2) with predicted
# r = y - m_prev, S = (P_prev + 1) + 10), slidingLikelihood = exp(sum of
# last 5 lls), then the max-shift weighting of operators/mmae.py (weights
# relative to the per-stateIndex max; uniform when the max underflows to 0).
# Rounded to 4dp: collect_list ordering makes the Spark-side sum order
# nondeterministic, so the check is margin-rounded, not bit-exact.
_MMAE_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k, value,
         ROW_NUMBER() OVER (PARTITION BY user_id % {N_KEYS} ORDER BY ts, event_id) AS rn
  FROM events
),
rec(k, rn, m, p, ll) AS (
  SELECT k, rn,
         0.0 + (((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0))) * (value - 0.0)),
         ((1.0 - ((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0)))) * (100.0 + 1.0))
             * (1.0 - ((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0))))
           + (((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0))) * 10.0)
             * ((100.0 + 1.0) * (1.0 / ((100.0 + 1.0) + 10.0))),
         -0.5 * (ln(2.0 * pi()) + 2.0 * ln(sqrt((100.0 + 1.0) + 10.0))
                 + pow((value - 0.0) / sqrt((100.0 + 1.0) + 10.0), 2))
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.k, o.rn,
         r.m + (((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0))) * (o.value - r.m)),
         ((1.0 - ((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0)))) * (r.p + 1.0))
             * (1.0 - ((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0))))
           + (((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0))) * 10.0)
             * ((r.p + 1.0) * (1.0 / ((r.p + 1.0) + 10.0))),
         -0.5 * (ln(2.0 * pi()) + 2.0 * ln(sqrt((r.p + 1.0) + 10.0))
                 + pow((o.value - r.m) / sqrt((r.p + 1.0) + 10.0), 2))
  FROM rec r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
),
sll AS (
  SELECT k, rn, m,
         exp(SUM(ll) OVER (PARTITION BY k ORDER BY rn
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS w
  FROM rec
),
mx AS (SELECT rn, MAX(w) AS mw FROM sll GROUP BY rn),
wts AS (
  SELECT s.rn, s.m,
         CASE WHEN x.mw IS NULL OR x.mw <= 0.0 THEN 1.0
              WHEN isinf(x.mw) THEN (CASE WHEN s.w = x.mw THEN 1.0 ELSE 0.0 END)
              ELSE s.w / x.mw END AS relw
  FROM sll s JOIN mx x ON x.rn = s.rn
)
SELECT rn AS stateIndex, ROUND(SUM(relw * m) / SUM(relw), 4) AS consensus_mean
FROM wts GROUP BY rn
"""


# Online Gaussian mixture (k=2, 1-D, minibatch=1, stepSize=0.1,
# updateHoldout=0): the stochastic-EM cycle (mixture.py _mixture_fold_factory
# :276-296) degenerates to a per-row scalar recursion over the weight-scaled
# sufficient stats (sw_j, sm_j, sc_j); the model is always the derived form
# m_j = sm_j/sw_j, v_j = sc_j/sw_j, w_j = sw_j. Base case is the rn=0 initial
# state (weights [.5,.5] scaled into means [25,75], covs [100,100]), so the
# step expression appears once. Rounded to 5dp — the softmax/logsumexp float
# paths differ across engines but the recursion is contracting (0.9 decay);
# margin guarded in tests/test_oracle_margins.py.
_GMM_1D_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k, value,
         ROW_NUMBER() OVER (PARTITION BY user_id % {N_KEYS} ORDER BY ts, event_id) AS rn
  FROM events
),
rec(k, rn, sw0, sw1, sm0, sm1, sc0, sc1) AS (
  SELECT k, 0, CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(12.5 AS DOUBLE),
         CAST(37.5 AS DOUBLE), CAST(50.0 AS DOUBLE), CAST(50.0 AS DOUBLE)
  FROM (SELECT DISTINCT k FROM ordered)
  UNION ALL
  SELECT t.k, t.rn,
         0.9 * t.sw0 + 0.1 * t.resp0,
         0.9 * t.sw1 + 0.1 * t.resp1,
         0.9 * t.sm0 + 0.1 * (t.resp0 * t.x),
         0.9 * t.sm1 + 0.1 * (t.resp1 * t.x),
         0.9 * t.sc0 + 0.1 * (t.resp0 * ((t.x - t.m0) * (t.x - t.m0))),
         0.9 * t.sc1 + 0.1 * (t.resp1 * ((t.x - t.m1) * (t.x - t.m1)))
  FROM (
    SELECT u.*, u.e0 / (u.e0 + u.e1) AS resp0, u.e1 / (u.e0 + u.e1) AS resp1
    FROM (
      SELECT s.*, exp(s.ll0 - greatest(s.ll0, s.ll1)) AS e0,
                  exp(s.ll1 - greatest(s.ll0, s.ll1)) AS e1
      FROM (
        SELECT q.*,
               -0.5 * (ln(2.0 * pi()) + ln(q.v0) + ((q.x - q.m0) * (q.x - q.m0)) / q.v0)
                 + ln(q.sw0) AS ll0,
               -0.5 * (ln(2.0 * pi()) + ln(q.v1) + ((q.x - q.m1) * (q.x - q.m1)) / q.v1)
                 + ln(q.sw1) AS ll1
        FROM (
          SELECT o.k, o.rn, o.value AS x,
                 r.sw0, r.sw1, r.sm0, r.sm1, r.sc0, r.sc1,
                 r.sm0 / r.sw0 AS m0, r.sm1 / r.sw1 AS m1,
                 r.sc0 / r.sw0 AS v0, r.sc1 / r.sw1 AS v1
          FROM rec r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
        ) q
      ) s
    ) u
  ) t
)
SELECT k AS stateKey, rn AS stateIndex,
       ROUND(sw0, 5) AS w0, ROUND(sm0 / sw0, 5) AS mean0, ROUND(sm1 / sw1, 5) AS mean1
FROM rec WHERE rn >= 1
"""


# Online Poisson mixture (k=2, minibatch=1): same scalar recursion over
# (sw_j, sr_j) with r_j = sr_j/sw_j; the gammaln(x+1) sample term is common
# to both components and cancels in the responsibility softmax. Spark's
# CAST(double AS long) truncates while DuckDB's rounds, hence FLOOR.
_POISSON_MIX_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k,
         CAST(FLOOR(value / 10.0) AS BIGINT) AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id % {N_KEYS} ORDER BY ts, event_id) AS rn
  FROM events
),
rec(k, rn, sw0, sw1, sr0, sr1) AS (
  SELECT k, 0, CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(1.0 AS DOUBLE),
         CAST(4.0 AS DOUBLE)
  FROM (SELECT DISTINCT k FROM ordered)
  UNION ALL
  SELECT t.k, t.rn,
         0.9 * t.sw0 + 0.1 * t.resp0,
         0.9 * t.sw1 + 0.1 * t.resp1,
         0.9 * t.sr0 + 0.1 * (t.resp0 * t.x),
         0.9 * t.sr1 + 0.1 * (t.resp1 * t.x)
  FROM (
    SELECT u.*, u.e0 / (u.e0 + u.e1) AS resp0, u.e1 / (u.e0 + u.e1) AS resp1
    FROM (
      SELECT s.*, exp(s.ll0 - greatest(s.ll0, s.ll1)) AS e0,
                  exp(s.ll1 - greatest(s.ll0, s.ll1)) AS e1
      FROM (
        SELECT q.*,
               q.x * ln(q.r0) - q.r0 + ln(q.sw0) AS ll0,
               q.x * ln(q.r1) - q.r1 + ln(q.sw1) AS ll1
        FROM (
          SELECT o.k, o.rn, o.x, r.sw0, r.sw1, r.sr0, r.sr1,
                 r.sr0 / r.sw0 AS r0, r.sr1 / r.sw1 AS r1
          FROM rec r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
        ) q
      ) s
    ) u
  ) t
)
SELECT k AS stateKey, rn AS stateIndex,
       ROUND(sw0, 5) AS w0, ROUND(sr0 / sw0, 5) AS rate0, ROUND(sr1 / sw1, 5) AS rate1
FROM rec WHERE rn >= 1
"""


# Online Bernoulli mixture (k=2, minibatch=1): scalar recursion over
# (sw_j, sp_j) with p_j = sp_j/sw_j; logpmf = x*ln(p) + (1-x)*ln(1-p).
# Initial suff stats are the initial params scaled by the uniform weights
# (sp_j = p_j * 0.5), matching the fold's scal() initialization.
_BERNOULLI_MIX_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % {N_KEYS} AS VARCHAR) AS k,
         CASE WHEN value > 5 THEN 1.0 ELSE 0.0 END AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id % {N_KEYS} ORDER BY ts, event_id) AS rn
  FROM events
),
rec(k, rn, sw0, sw1, sp0, sp1) AS (
  SELECT k, 0, CAST(0.5 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.1 AS DOUBLE),
         CAST(0.4 AS DOUBLE)
  FROM (SELECT DISTINCT k FROM ordered)
  UNION ALL
  SELECT t.k, t.rn,
         0.9 * t.sw0 + 0.1 * t.resp0,
         0.9 * t.sw1 + 0.1 * t.resp1,
         0.9 * t.sp0 + 0.1 * (t.resp0 * t.x),
         0.9 * t.sp1 + 0.1 * (t.resp1 * t.x)
  FROM (
    SELECT u.*, u.e0 / (u.e0 + u.e1) AS resp0, u.e1 / (u.e0 + u.e1) AS resp1
    FROM (
      SELECT s.*, exp(s.ll0 - greatest(s.ll0, s.ll1)) AS e0,
                  exp(s.ll1 - greatest(s.ll0, s.ll1)) AS e1
      FROM (
        SELECT q.*,
               q.x * ln(q.p0) + (1.0 - q.x) * ln(1.0 - q.p0) + ln(q.sw0) AS ll0,
               q.x * ln(q.p1) + (1.0 - q.x) * ln(1.0 - q.p1) + ln(q.sw1) AS ll1
        FROM (
          SELECT o.k, o.rn, o.x, r.sw0, r.sw1, r.sp0, r.sp1,
                 r.sp0 / r.sw0 AS p0, r.sp1 / r.sw1 AS p1
          FROM rec r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
        ) q
      ) s
    ) u
  ) t
)
SELECT k AS stateKey, rn AS stateIndex,
       ROUND(sw0, 5) AS w0, ROUND(sp0 / sw0, 5) AS p0, ROUND(sp1 / sw1, 5) AS p1
FROM rec WHERE rn >= 1
"""


# 3-D Kalman OLS (per-row measurement model h = [hour, sqrt(hour+0.5), 1],
# F=I, Q=0, P0=100I, R=100): the update unrolls over the symmetric P — with
# v = P·h, S = h·v + R, K = v/S, the Joseph form collapses to
# P'_ij = P_ij − K_i·v_j − K_j·v_i + K_i·K_j·S. Engines differ only in
# matmul op order/FMA (~1e-12 abs); rounded to 4dp (margin >=2700x,
# guarded by tests/test_oracle_margins.py).
_KF_3D_OLS_SQL = """
WITH RECURSIVE ordered AS (
  SELECT CAST(user_id % 512 AS VARCHAR) AS k,
         CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS x, value AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id % 512 ORDER BY ts, event_id) AS rn
  FROM events
),
rec(k, rn, m0, m1, m2, p00, p01, p02, p11, p12, p22) AS (
  SELECT k, 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
         CAST(100 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
         CAST(100 AS DOUBLE), CAST(0 AS DOUBLE), CAST(100 AS DOUBLE)
  FROM (SELECT DISTINCT k FROM ordered)
  UNION ALL
  SELECT t.k, t.rn,
         t.m0 + t.k0 * t.e, t.m1 + t.k1 * t.e, t.m2 + t.k2 * t.e,
         t.p00 - t.k0*t.v0 - t.k0*t.v0 + t.k0*t.k0*t.s,
         t.p01 - t.k0*t.v1 - t.k1*t.v0 + t.k0*t.k1*t.s,
         t.p02 - t.k0*t.v2 - t.k2*t.v0 + t.k0*t.k2*t.s,
         t.p11 - t.k1*t.v1 - t.k1*t.v1 + t.k1*t.k1*t.s,
         t.p12 - t.k1*t.v2 - t.k2*t.v1 + t.k1*t.k2*t.s,
         t.p22 - t.k2*t.v2 - t.k2*t.v2 + t.k2*t.k2*t.s
  FROM (
    SELECT w.*, w.v0 / w.s AS k0, w.v1 / w.s AS k1, w.v2 / w.s AS k2,
           w.y - (w.h0*w.m0 + w.h1*w.m1 + w.h2*w.m2) AS e
    FROM (
      SELECT q.*, q.h0*q.v0 + q.h1*q.v1 + q.h2*q.v2 + 100.0 AS s
      FROM (
        SELECT o.k, o.rn, o.y, o.x AS h0, sqrt(o.x + 0.5) AS h1,
               CAST(1 AS DOUBLE) AS h2,
               r.m0, r.m1, r.m2, r.p00, r.p01, r.p02, r.p11, r.p12, r.p22,
               r.p00*o.x + r.p01*sqrt(o.x + 0.5) + r.p02 AS v0,
               r.p01*o.x + r.p11*sqrt(o.x + 0.5) + r.p12 AS v1,
               r.p02*o.x + r.p12*sqrt(o.x + 0.5) + r.p22 AS v2
        FROM rec r JOIN ordered o ON o.k = r.k AND o.rn = r.rn + 1
      ) q
    ) w
  ) t
)
SELECT k AS stateKey, rn AS stateIndex,
       ROUND(m0, 4) AS coef_hour, ROUND(m2, 4) AS intercept
FROM rec WHERE rn >= 1
"""


# -- 1-D LMS / RLS with full recursive-CTE oracles --------------------------


def lms_events_1d(spark, sf_dir):
    """Scalar normalized-LMS over event values per key; SQL-checkable:
    m' = m + (y - m)/2 with lr=reg=1, x=[1]."""
    df = _events_measurements(spark, sf_dir).select(
        "key", "ts", F.col("value").alias("label"), F.array(F.lit(1.0)).alias("features")
    )
    # vectorized multi-key fold: the 1-D normalized-LMS step is elementwise,
    # so it is bit-identical to the sequential fold (test_filters.py).
    # initialState is deliberately unset, so the auto engine stays on the
    # sequential fold (feature dim unknowable pre-data) — this entry is one
    # of the window's bit-exact raw-double sequential pins.
    lms = (
        LeastMeanSquaresFilter()
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setVectorizedBatch(True)
    )
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
        # EXPLICIT sequential pin (the auto engine's escape hatch,
        # exercised by the driver gate): with x=[1] the recursion gives
        # m_k = cent-sums / (k+1), which lands EXACTLY on 4dp rounding
        # boundaries whenever k+1 is a power of two (p_31 = 1/32,
        # m = .xxx75/.xx375 — measured dist-to-boundary 0.0 at sf0.001),
        # so no rounded oracle is safe here and the scan's ~1e-15 noise
        # breaks the raw hash. The sequential fold is bit-identical to
        # the CTE; the RLS scan's parity is pinned in test_scan_engine.py.
        .setFoldEngine("sequential")
        .setVectorizedBatch(True)
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


STREAM_CHUNK_ROWS = 2000  # ~5 micro-batches at the driver gate's sf0.01


def lkf_events_streamed(spark, sf_dir):
    """The batch LKF entry executed through the STREAMING backend: the
    same events feed replayed as a file stream (one micro-batch per chunk
    via maxFilesPerTrigger) through ``applyInPandasWithState``, checked
    against the SAME recursive-CTE oracle as ``lkf_events_local_level`` —
    so the external gate pins streaming execution == batch == SQL, not
    just the pytest replay tests. Correctness-gate shape only: the replay
    harness collects the feed to the driver to chunk it (bounded at the
    gate's SF; production streams read a real source)."""
    from artan_spark.streaming.harness import stream_transform

    flt = _local_level(LinearKalmanFilter)
    out = stream_transform(
        spark,
        _events_measurements(spark, sf_dir),
        flt.transform,
        chunk_rows=STREAM_CHUNK_ROWS,
    )
    return _finalize_raw(out)


QUERIES = {
    "lkf_events_local_level": lkf_events_local_level,
    "lkf_events_streamed": lkf_events_streamed,
    "ekf_events_local_level": ekf_events_local_level,
    "ukf_events_local_level": ukf_events_local_level,
    # r12 rotation: CKF (same sigma family as the windowed UKF, stable
    # since r3) keeps its oracle in the pytest gate; batch EM takes the
    # slot (the driver loop had never been hard-gate-checked)
    "gmm_batch_em_events": gmm_batch_em_events,
    "rts_smoother_events": rts_smoother_events,
    "mmae_events": mmae_events,
    "lkf_ols_multikey": lkf_ols_multikey,
    "gmm_events_value": gmm_events_value,
    "poisson_mixture_events": poisson_mixture_events,
    "bernoulli_mixture_events": bernoulli_mixture_events,
    "lms_events_1d": lms_events_1d,
    "rls_events_1d": rls_events_1d,
}

# scalar recursions are SQL-expressible bit-exactly; sigma-point/consensus
# variants via margin-guarded rounding (see comments above each SQL)
ORACLES = {
    "lkf_events_local_level": _KF_1D_ROUNDED_SQL,
    "lkf_events_streamed": _KF_1D_SQL,
    "ekf_events_local_level": _KF_1D_SQL,
    "ukf_events_local_level": _KF_1D_ROUNDED_SQL,
    "gmm_batch_em_events": _GMM_BATCH_EM_SQL,
    "rts_smoother_events": _SMOOTHER_1D_ROUNDED_SQL,
    "mmae_events": _MMAE_SQL,
    "gmm_events_value": _GMM_1D_SQL,
    "poisson_mixture_events": _POISSON_MIX_SQL,
    "bernoulli_mixture_events": _BERNOULLI_MIX_SQL,
    "lkf_ols_multikey": _KF_3D_OLS_SQL,
    "lms_events_1d": _LMS_1D_SQL,
    "rls_events_1d": _RLS_1D_SQL,
}

# r12 window rotation: CKF keeps its margin-rounded oracle in the pytest
# gate (UKF stays windowed for the sigma-point family)
PYTEST_ORACLES = {
    "ckf_events_local_level": (ckf_events_local_level, _KF_1D_ROUNDED_SQL),
    # the distributed cross-task engines, against the same rounded CTEs as
    # the windowed default-engine entries (driver window is capped at 50)
    "lkf_events_distscan": (lkf_events_distscan, _KF_1D_ROUNDED_SQL),
    "rts_smoother_distscan": (rts_smoother_distscan, _SMOOTHER_1D_ROUNDED_SQL),
}
