"""Guard the rounding margin behind the UKF/CKF 4dp oracles.

The sigma-point filters on the linear local-level model are oracled against
the *exact* KF recursion rounded to 4dp (plans/estimation.py
``_KF_1D_ROUNDED_SQL``). That is only sound while two measured facts hold:

1. the sigma-point arithmetic tracks the exact recursion to ~1e-12 abs, and
2. no exact value sits close enough to a 4dp rounding boundary that the
   sigma-point noise could flip the rounded digit.

This test re-measures both on the test corpus and asserts a wide safety
factor, so a testdata regeneration or a sigma-fold change that erodes the
margin fails loudly instead of producing a flaky hash mismatch in the
driver's correctness gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from artan_spark.operators import CubatureKalmanFilter, UnscentedKalmanFilter
from artan_spark.plans import estimation as est
from artan_spark.plans.oracle import duckdb_frame

from conftest import SF_DIR

# measured at sf0.001/sf0.01: deviation ≤2.7e-12, boundary distance ≥8.3e-9
MAX_DEVIATION = 1e-10
MIN_SAFETY_FACTOR = 100.0


def _raw_sigma_run(spark, cls):
    flt = est._local_level(cls).setVectorizedBatch(True)
    out = flt.transform(est._events_measurements(spark, SF_DIR))
    import pyspark.sql.functions as F

    return out.select(
        "stateKey",
        "stateIndex",
        F.col("state.mean")[0].alias("state_mean"),
        F.col("state.covariance.values")[0].alias("state_var"),
    ).toPandas()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize(
    "sql_name, repl",
    [
        (
            "_GMM_1D_SQL",
            [("ROUND(sw0, 5)", "sw0"), ("ROUND(sm0 / sw0, 5)", "sm0 / sw0"), ("ROUND(sm1 / sw1, 5)", "sm1 / sw1")],
        ),
        (
            "_POISSON_MIX_SQL",
            [("ROUND(sw0, 5)", "sw0"), ("ROUND(sr0 / sw0, 5)", "sr0 / sw0"), ("ROUND(sr1 / sw1, 5)", "sr1 / sw1")],
        ),
        (
            "_BERNOULLI_MIX_SQL",
            [("ROUND(sw0, 5)", "sw0"), ("ROUND(sp0 / sw0, 5)", "sp0 / sw0"), ("ROUND(sp1 / sw1, 5)", "sp1 / sw1")],
        ),
        (
            "_GMM_BATCH_EM_SQL",
            [
                ("ROUND(sw0, 5)", "sw0"),
                ("ROUND(sm0 / sw0, 5)", "sm0 / sw0"),
                ("ROUND(sm1 / sw1, 5)", "sm1 / sw1"),
                ("ROUND(sc0 / sw0, 5)", "sc0 / sw0"),
                ("ROUND(sc1 / sw1, 5)", "sc1 / sw1"),
            ],
        ),
    ],
)
def test_mixture_oracle_margin(sql_name, repl, sf_dir):
    """The mixture oracles round to 5dp because the engines' softmax float
    paths differ (~1e-13 rel, contracting recursion). Guard that no raw value
    sits near a 5dp boundary — at BOTH test SFs (the driver gate compares
    at sf0.01; the r9 hypertable flip proved regeneration can move either)."""
    raw_sql = getattr(est, sql_name)
    for old, new in repl:
        assert old in raw_sql
        raw_sql = raw_sql.replace(old, new)
    df = duckdb_frame(raw_sql, sf_dir)
    for col in df.columns:
        if col in ("stateKey", "stateIndex"):
            continue
        v = df[col].to_numpy(dtype=float)
        scaled = v * 1e5
        dist = np.abs(scaled - np.floor(scaled) - 0.5)
        # Threshold calibrated to the MEASURED cross-engine deviation, not
        # a guessed relative model: full GMM Spark-vs-DuckDB raw compare at
        # sf0.01 (10k rows x 3 cols, r10) gives max abs deviation 1.7e-13
        # (8e-15 rel). Budget 5e-13 abs (3x measured worst), scale by 1e5
        # (the 5dp grid), 20x safety -> 1e-6 scaled. With ~30k uniform
        # boundary distances per SF the expected MINIMUM distance is ~8e-6,
        # so this canary stays quiet on a typical regeneration (~6% fire
        # rate) while an actual flip needs dist < 2e-8 — it fires ~50x
        # before the driver gate could mismatch.
        tol = 1e-6
        bad = dist <= tol
        assert not bad.any(), (
            f"{sql_name}.{col}@{sf_dir}: {int(bad.sum())} value(s) within "
            f"{tol:.0e} (scaled) of a 5dp boundary "
            f"(min dist {dist.min():.3e}) — re-measure deviation or re-seed"
        )


def test_kf3d_ols_oracle_margin(spark):
    """The 3-D OLS oracle rounds to 4dp because engines disagree on matmul
    op order/FMA (~1e-12 abs). Guard both the deviation and the boundary
    distance; the sqrt(hour+0.5) basis keeps gains non-dyadic, which is what
    bounds values away from boundaries (see lkf_ols_multikey docstring)."""
    raw_sql = est._KF_3D_OLS_SQL.replace("ROUND(m0, 4)", "m0").replace("ROUND(m2, 4)", "m2")
    ddf = duckdb_frame(raw_sql, SF_DIR)
    import pyspark.sql.functions as F

    # same transform as the inventory query, minus the output rounding
    from artan_spark.operators import LinearKalmanFilter
    from artan_spark.sources import read_table

    e = read_table(spark, SF_DIR, "events")
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
    raw = flt.transform(df).select(
        "stateKey",
        "stateIndex",
        F.col("state.mean")[0].alias("coef_hour"),
        F.col("state.mean")[2].alias("intercept"),
    ).toPandas()

    merged = ddf.merge(raw, on=["stateKey", "stateIndex"], suffixes=("_d", "_s"), validate="1:1")
    assert len(merged) == len(ddf) == len(raw)
    for c in ("coef_hour", "intercept"):
        dev = np.abs(merged[f"{c}_d"] - merged[f"{c}_s"]).max()
        assert dev < 1e-10, f"{c}: engine deviation {dev:.3e}"
        v = merged[f"{c}_d"].to_numpy()
        scaled = v * 1e4
        dist = (np.abs(scaled - np.floor(scaled) - 0.5) * 1e-4).min()
        assert dist > MIN_SAFETY_FACTOR * max(dev, 1e-15), (
            f"{c}: 4dp boundary distance {dist:.3e} vs deviation {dev:.3e}"
        )


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_mmae_oracle_margin(sf_dir):
    """MMAE's consensus sums 32 per-key contributions in collect_list order,
    which Spark does not fix — the 4dp rounding must sit far from every
    boundary so reordering noise (~1e-12 rel) cannot flip a rounded digit."""
    raw_sql = est._MMAE_SQL.replace(
        "ROUND(SUM(relw * m) / SUM(relw), 4)", "SUM(relw * m) / SUM(relw)"
    )
    v = duckdb_frame(raw_sql, sf_dir)["consensus_mean"].to_numpy()
    scaled = v * 1e4
    dist = (np.abs(scaled - np.floor(scaled) - 0.5) * 1e-4).min()
    assert dist > 1e-9, f"MMAE 4dp boundary distance {dist:.3e} too small"


@pytest.mark.parametrize("cls", [UnscentedKalmanFilter, CubatureKalmanFilter])
def test_sigma_oracle_margin(spark, cls):
    exact = duckdb_frame(est._KF_1D_SQL, SF_DIR)
    sigma = _raw_sigma_run(spark, cls)
    merged = exact.merge(
        sigma, on=["stateKey", "stateIndex"], suffixes=("_exact", "_sigma"), validate="1:1"
    )
    assert len(merged) == len(exact) == len(sigma)

    for col in ("state_mean", "state_var"):
        ex = merged[f"{col}_exact"].to_numpy()
        sg = merged[f"{col}_sigma"].to_numpy()
        deviation = np.abs(ex - sg).max()
        assert deviation < MAX_DEVIATION, f"{col}: sigma deviation {deviation:.3e}"

        # distance of each exact value to its nearest 4dp rounding boundary
        scaled = ex * 1e4
        frac = np.abs(scaled - np.floor(scaled) - 0.5) * 1e-4
        margin = frac.min()
        floor = max(deviation, 1e-15)
        assert margin > MIN_SAFETY_FACTOR * floor, (
            f"{col}: boundary margin {margin:.3e} < {MIN_SAFETY_FACTOR}x "
            f"deviation {deviation:.3e} — 4dp oracle no longer safe"
        )


# -- relational registry: every remaining FLOAT-rounded aggregate ------------
#
# Round 10 moved every rounded float SUM in plans/relational.py to exact
# decimal arithmetic (order-independent, boundary-deterministic — the r9
# events_hypertable_rollup flip cannot recur there). What remains rounded in
# FLOAT are the AVG-style quotients (one IEEE division of identical operands
# per engine) and 2dp rounds of values that are 2dp by construction. Guard
# each one the same way as the estimation CTEs: strip the ROUND, measure the
# raw value's distance to its rounding boundary at BOTH test SFs, and fail
# loudly when a regeneration parks a value near a boundary — instead of a
# mystery hash mismatch in the driver's correctness gate.

_REL_MARGIN_CASES = [
    (
        "_Q1_SQL",
        [
            ("ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6)", 6, "avg_qty", "quotient"),
            ("ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6)", 6, "avg_price", "quotient"),
            ("ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*), 6)", 6, "avg_disc", "quotient"),
        ],
    ),
    (
        "_EVENTS_WINDOW_SQL",
        [("ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)", 6, "avg_value", "quotient")],
    ),
    (
        "_SKEW_SAFE_SQL",
        [
            ("ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)", 6, "avg_value", "quotient"),
            ("ROUND(MAX(value), 6)", 6, "max_value", "quotient"),
        ],
    ),
    # orders_priority_rollup / customer_order_balance total_spent moved to
    # exact decimal sums when this guard showed that a float SUM of ~1e8
    # 2-dp money values carries reorder noise comparable to its own
    # boundary distance at 100-TB magnitudes — nothing left to measure
    # there. Only acctbal (a single stored 2-dp value) stays float-rounded.
    (
        "_CUST_BALANCE_SQL",
        [("ROUND(c_acctbal, 2)", 2, "acctbal", "quotient")],
    ),
]

# Engine-disagreement noise per column class, in units of the SCALED value
# (v * 10^dp, where the rounding boundary sits at .5):
# - "quotient": both engines hold the IDENTICAL double (exact decimal sum /
#   count, or a single stored value); the only cross-engine difference is the
#   ROUND implementation itself (exact-expansion HALF_UP vs double-multiply
#   rint), which disagrees only within ~2 ulps of the scaled value.
# - "floatsum": the engines sum doubles in different orders; accumulated
#   reorder noise is ~sqrt(n) ulps — budget 1e4 ulps (n up to ~1e8 terms).
_NOISE_ULPS = {"quotient": 2.0, "floatsum": 1e4}
_SAFETY = 100.0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("sql_name, cols", _REL_MARGIN_CASES, ids=[c[0] for c in _REL_MARGIN_CASES])
def test_relational_oracle_margin(sql_name, cols, sf_dir):
    from artan_spark.plans import relational as rel

    raw_sql = getattr(rel, sql_name)
    for snippet, _dp, _col, _kind in cols:
        assert snippet in raw_sql, f"{sql_name}: ROUND site moved — update this guard"
        inner = snippet[len("ROUND("):snippet.rindex(",")]
        raw_sql = raw_sql.replace(snippet, inner)
    df = duckdb_frame(raw_sql, sf_dir)
    for _snippet, dp, col, kind in cols:
        if col is None:
            continue
        v = df[col].to_numpy(dtype=float)
        v = v[np.isfinite(v)]
        scaled = v * (10.0**dp)
        # distance of each raw scaled value to its nearest half-boundary
        # (max 0.5) vs the class noise budget with a 100x safety factor
        dist = np.abs(scaled - np.floor(scaled) - 0.5)
        tol = np.maximum(
            1e-6, _SAFETY * _NOISE_ULPS[kind] * np.abs(scaled) * 2.3e-16
        )
        bad = dist <= tol
        assert not bad.any(), (
            f"{sql_name}.{col}@{sf_dir}: {int(bad.sum())} value(s) within "
            f"{tol[bad].max():.1e} (scaled) of a {dp}dp rounding boundary "
            f"(min dist {dist.min():.3e}) — regeneration made this oracle fragile"
        )


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_dsir_logw_margin(sf_dir):
    """DSIR's 6dp-rounded log-weight is a float SUM of ~O(100) log terms
    whose order differs between engines (noise bound: terms x ulp ~ 7e-13
    abs -> 0.7 micro-units at the 6dp grid). Guard a 15x margin at both
    SFs — the remaining ROUND(SUM(float)) pair outside relational.py,
    audited per the r9 verdict."""
    from artan_spark.plans import dsir

    raw_sql = dsir._DSIR_SQL
    tgt = "ROUND(SUM(c * (ln((COALESCE(cp, 0)"
    assert tgt in raw_sql
    # strip just the outer ROUND(...,6) of the logw aggregate
    i = raw_sql.index(tgt)
    j = raw_sql.index(", 6) AS logw", i)
    inner = raw_sql[i + len("ROUND("):j]
    raw_sql = raw_sql[:i] + inner + " AS logw_raw" + raw_sql[j + len(", 6) AS logw"):]
    raw_sql = raw_sql.replace("lw.logw,", "lw.logw_raw AS logw,").replace(
        "ROUND(lw.logw\n", "ROUND(lw.logw_raw\n"
    )
    df = duckdb_frame(raw_sql, sf_dir)
    v = df["logw"].to_numpy(dtype=float)
    scaled = v * 1e6
    dist = np.abs(scaled - np.floor(scaled) - 0.5)
    assert (dist > 1e-5).all(), f"dsir logw 6dp min boundary dist {dist.min():.3e}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_bm25_score_margin(sf_dir):
    """BM25's 6dp-rounded score sums a handful of per-term float parts
    (noise ~ ulp-scale). Same strip-and-measure guard."""
    from artan_spark.plans import bm25

    raw_sql = bm25._BM25_SQL if hasattr(bm25, "_BM25_SQL") else None
    if raw_sql is None:
        import re

        cands = [v for k, v in vars(bm25).items() if isinstance(v, str) and "ROUND(SUM(part), 6)" in v]
        assert cands, "bm25 oracle SQL moved — update this guard"
        raw_sql = cands[0]
    assert "ROUND(SUM(part), 6)" in raw_sql
    raw_sql = raw_sql.replace("ROUND(SUM(part), 6)", "SUM(part)")
    df = duckdb_frame(raw_sql, sf_dir)
    v = df["score"].to_numpy(dtype=float)
    scaled = v * 1e6
    dist = np.abs(scaled - np.floor(scaled) - 0.5)
    assert (dist > 1e-5).all(), f"bm25 score 6dp min boundary dist {dist.min():.3e}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_embdecon_cosine_margin(sf_dir):
    """docs_decontaminate_embedding rounds a 64-term float dot product at
    6dp AND filters on it (c >= threshold): guard BOTH the rounding
    boundary and the threshold crossing. Cross-engine noise is dot-sum
    reorder, ~dim ulps of the value (64 x 2.3e-16 ~ 1.5e-14 abs for unit
    cosines) — budget 1e-9 with safety, far under the measured distances."""
    from artan_spark.plans import sampling as smp

    raw_sql = smp._EMB_DECON_SQL
    tgt = "ROUND(c, 6) AS max_cosine"
    assert tgt in raw_sql, "embdecon ROUND site moved — update this guard"
    raw_sql = raw_sql.replace(tgt, "c AS max_cosine")
    # keep every best-match row (drop the threshold filter) so the
    # threshold-distance check sees near-misses on BOTH sides
    cut = f"AND c >= {smp.EMB_DECON_THRESHOLD}"
    assert cut in raw_sql
    raw_sql = raw_sql.replace(cut, "")
    df = duckdb_frame(raw_sql, sf_dir)
    v = df["max_cosine"].to_numpy(dtype=float)
    scaled = v * 1e6
    dist = np.abs(scaled - np.floor(scaled) - 0.5)
    # noise budget: 100x safety x 64 ulps of a unit value, in scaled units
    assert (dist > 1e-5).all(), (
        f"embdecon max_cosine 6dp min boundary dist {dist.min():.3e} (scaled)"
    )
    thr_dist = np.abs(v - smp.EMB_DECON_THRESHOLD).min()
    assert thr_dist > 1e-9, (
        f"a max_cosine sits {thr_dist:.3e} from the keep threshold — "
        "regeneration made the row set itself fragile"
    )


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_zipf_slope_margin(sf_dir):
    """docs_zipf_stats rounds an OLS slope (float sums over <=1000 log
    terms, engines sum in different orders) at 6dp — strip the ROUND and
    measure boundary distance, same regime as dsir/bm25."""
    from artan_spark.plans import textstats as ts

    raw_sql = ts._ZIPF_SQL
    tgt = "ROUND(s.zipf_slope_raw, 6) AS zipf_slope"
    assert tgt in raw_sql, "zipf ROUND site moved — update this guard"
    raw_sql = raw_sql.replace(tgt, "s.zipf_slope_raw AS zipf_slope")
    df = duckdb_frame(raw_sql, sf_dir)
    v = df["zipf_slope"].to_numpy(dtype=float)
    scaled = v * 1e6
    dist = np.abs(scaled - np.floor(scaled) - 0.5)
    assert (dist > 1e-5).all(), f"zipf_slope 6dp min boundary dist {dist.min():.3e}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_emb_outlier_margin(sf_dir):
    """embedding_outliers rounds cos (64-term dot) and z (a quotient of
    label-sized float aggregates) at 6dp AND filters on raw z <= -2: guard
    the rounding boundaries of the SURVIVING rows and the threshold
    distance of EVERY row (either side can flip the row set)."""
    from artan_spark.plans import simsearch as ss

    raw_sql = ss._EMB_OUTLIER_SQL
    for tgt, repl in [
        ("ROUND(cos, 6) AS cos_centroid", "cos AS cos_centroid"),
        ("ROUND(z, 6) AS z_score", "z AS z_score"),
    ]:
        assert tgt in raw_sql, "outlier ROUND site moved — update this guard"
        raw_sql = raw_sql.replace(tgt, repl)
    cut = f"WHERE z <= -{ss.OUTLIER_Z}"
    assert cut in raw_sql
    raw_sql = raw_sql.replace(cut, "")
    df = duckdb_frame(raw_sql, sf_dir)
    z = df["z_score"].to_numpy(dtype=float)
    z = z[np.isfinite(z)]
    thr = np.abs(z + ss.OUTLIER_Z).min()
    assert thr > 1e-9, f"a z sits {thr:.3e} from the flag threshold"
    kept = df[df["z_score"] <= -ss.OUTLIER_Z]
    for col in ("cos_centroid", "z_score"):
        v = kept[col].to_numpy(dtype=float)
        scaled = v * 1e6
        dist = np.abs(scaled - np.floor(scaled) - 0.5)
        assert (dist > 1e-5).all(), f"{col} 6dp min boundary dist {dist.min():.3e}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_anomaly_zscore_margin(sf_dir):
    """events_anomaly_zscore rounds z at 6dp and filters on |z| >= 3.
    Measured cross-engine deviation (sliding AVG/STDDEV paths) is <=4e-15
    abs at both SFs; guard the boundary distance of surviving rows and the
    threshold distance of ALL scored rows."""
    from artan_spark.plans import temporal as tp

    raw_sql = tp._ANOMALY_SQL
    tgt = "ROUND(z, 6) AS z_score"
    assert tgt in raw_sql, "anomaly ROUND site moved — update this guard"
    raw_sql = raw_sql.replace(tgt, "z AS z_score")
    cut = f"WHERE abs(z) >= {tp.ANOMALY_Z}"
    assert cut in raw_sql
    raw_sql = raw_sql.replace(cut, "")
    df = duckdb_frame(raw_sql, sf_dir)
    z = df["z_score"].to_numpy(dtype=float)
    z = z[np.isfinite(z)]
    thr = np.abs(np.abs(z) - tp.ANOMALY_Z).min()
    assert thr > 1e-9, f"a |z| sits {thr:.3e} from the flag threshold"
    kept = z[np.abs(z) >= tp.ANOMALY_Z]
    scaled = kept * 1e6
    dist = np.abs(scaled - np.floor(scaled) - 0.5)
    assert (dist > 1e-5).all(), f"z_score 6dp min boundary dist {dist.min():.3e}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_anomaly_robust_margin(sf_dir):
    """events_anomaly_robust: med/MAD are bit-equal cross-engine (exact
    medians, identical interpolation), so z is a quotient — guard the 6dp
    boundary of survivors and the |z| >= 3.5 threshold distance of all."""
    from artan_spark.plans import temporal as tp

    raw_sql = tp._ANOMALY_ROBUST_SQL
    tgt = "ROUND(z, 6) AS robust_z"
    assert tgt in raw_sql, "robust ROUND site moved — update this guard"
    raw_sql = raw_sql.replace(tgt, "z AS robust_z")
    cut = f"WHERE abs(z) >= {tp.ROBUST_Z}"
    assert cut in raw_sql
    raw_sql = raw_sql.replace(cut, "")
    df = duckdb_frame(raw_sql, sf_dir)
    z = df["robust_z"].to_numpy(dtype=float)
    z = z[np.isfinite(z)]
    thr = np.abs(np.abs(z) - tp.ROBUST_Z).min()
    assert thr > 1e-9, f"a |z| sits {thr:.3e} from the flag threshold"
    kept = z[np.abs(z) >= tp.ROBUST_Z]
    scaled = kept * 1e6
    dist = np.abs(scaled - np.floor(scaled) - 0.5)
    assert (dist > 1e-5).all(), f"robust_z 6dp min boundary dist {dist.min():.3e}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_cusum_margin(sf_dir):
    """events_cusum_drift rounds the max CUSUM stats at 6dp and compares
    them to the alarm threshold: guard both (prefix sums accumulate in the
    same (ts, event_id) order in both engines; residual noise is the
    whole-partition mu/sd aggregates' reorder, ~1e-13 of O(1) values)."""
    from artan_spark.plans import temporal as tp

    raw_sql = tp._CUSUM_SQL
    for tgt, repl in [
        ("ROUND(MAX(su), 6) AS max_cusum_up", "MAX(su) AS max_cusum_up"),
        ("ROUND(MAX(sd), 6) AS max_cusum_down", "MAX(sd) AS max_cusum_down"),
    ]:
        assert tgt in raw_sql, "cusum ROUND site moved — update this guard"
        raw_sql = raw_sql.replace(tgt, repl)
    df = duckdb_frame(raw_sql, sf_dir)
    for col in ("max_cusum_up", "max_cusum_down"):
        v = df[col].to_numpy(dtype=float)
        v = v[np.isfinite(v)]
        thr = np.abs(v - tp.CUSUM_H).min()
        assert thr > 1e-9, f"{col}: a stat sits {thr:.3e} from the alarm threshold"
        scaled = v * 1e6
        dist = np.abs(scaled - np.floor(scaled) - 0.5)
        assert (dist > 1e-5).all(), f"{col} 6dp min boundary dist {dist.min():.3e}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("which", ["stupid_backoff", "kneser_ney"])
def test_lm_perplexity_margin(which, sf_dir):
    """Both LM perplexity oracles round ppl at 6dp AND rank on the rounded
    value for the head/middle/tail buckets. exp(-AVG(ln p)) averages
    O(doc-length) log terms whose summation order differs between engines
    (noise ~ terms x ulp x ppl ~ 1e-10 abs): guard every raw ppl's
    distance to its 6dp boundary with a >=1e4x margin (strip-and-measure,
    the regime every rounded float oracle column lives under)."""
    from artan_spark.plans import lm

    raw_sql = (lm._LM_PPL_SQL if which == "stupid_backoff" else lm._KN_PPL_SQL)
    tgt = "ROUND(exp(-AVG(ln(p))), 6) AS ppl"
    assert tgt in raw_sql, "lm ppl ROUND site moved — update this guard"
    raw_sql = raw_sql.replace(tgt, "exp(-AVG(ln(p))) AS ppl")
    df = duckdb_frame(raw_sql, sf_dir)
    v = df["ppl"].to_numpy(dtype=float)
    assert np.isfinite(v).all(), "a document scored a non-finite perplexity"
    scaled = v * 1e6
    dist = np.abs(scaled - np.floor(scaled) - 0.5)
    assert (dist > 1e-5).all(), f"{which} ppl 6dp min boundary dist {dist.min():.3e}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_scan_engine_oracle_margins(spark, sf_dir):
    """The auto engine runs the parallel-scan fold on the lkf/rls/smoother
    driver entries, whose oracles therefore round to 4dp. Sound only while
    (1) the scan tracks the exact CTE recursion tightly and (2) no exact
    value sits near a 4dp boundary. Re-measure both at each gate SF."""
    import pyspark.sql.functions as F

    from artan_spark.operators import LinearKalmanFilter, LinearKalmanSmoother

    def spark_lkf():
        flt = est._local_level(LinearKalmanFilter)
        out = est._finalize_raw(flt.transform(est._events_measurements(spark, sf_dir)))
        assert flt._lastFoldEngine == "scan"
        return out.toPandas(), ["state_mean", "state_var"], ["stateKey", "stateIndex"]

    def spark_lkf_dist():
        # the cross-task engine behind the lkf_events_distscan pytest-oracle
        # entry: same 4dp rounding, so it needs the same margin audit
        flt = est._local_level(LinearKalmanFilter).setVectorizedBatch(True)
        flt.setFoldEngine("distributedScan").setScanChunkDuration("2 days")
        out = est._finalize_raw(flt.transform(est._events_measurements(spark, sf_dir)))
        assert flt._lastFoldEngine == "distributedScan"
        return out.toPandas(), ["state_mean", "state_var"], ["stateKey", "stateIndex"]

    def spark_smoother():
        sm = (
            LinearKalmanSmoother(1, 1)
            .setStateKeyCol("key")
            .setEventTimeCol("ts")
            .setInitialStateMean(np.zeros(1))
            .setInitialStateCovariance(np.array([[100.0]]))
            .setProcessNoise(np.array([[1.0]]))
            .setMeasurementNoise(np.array([[10.0]]))
            .setFixedLag(est.SMOOTHER_LAG)
        )
        out = sm.transform(est._events_measurements(spark, sf_dir)).select(
            "stateKey", "stateIndex", "stepIndex", F.col("state.mean")[0].alias("state_mean")
        )
        assert sm._lastFoldEngine == "scan"
        return out.toPandas(), ["state_mean"], ["stateKey", "stateIndex", "stepIndex"]

    # NOTE no RLS case: with x=[1] the RLS recursion yields exactly-dyadic
    # values (m_k = cent-sums/(k+1)) that land EXACTLY on 4dp boundaries
    # when k+1 is a power of two, so rls_events_1d pins the sequential
    # engine with a raw-double oracle instead of rounding (estimation.py).
    def spark_smoother_dist():
        sm = (
            LinearKalmanSmoother(1, 1)
            .setStateKeyCol("key")
            .setEventTimeCol("ts")
            .setInitialStateMean(np.zeros(1))
            .setInitialStateCovariance(np.array([[100.0]]))
            .setProcessNoise(np.array([[1.0]]))
            .setMeasurementNoise(np.array([[10.0]]))
            .setFixedLag(est.SMOOTHER_LAG)
            .setVectorizedBatch(True)
            .setFoldEngine("distributedScan")
            .setScanChunkDuration("2 days")
        )
        out = sm.transform(est._events_measurements(spark, sf_dir)).select(
            "stateKey", "stateIndex", "stepIndex", F.col("state.mean")[0].alias("state_mean")
        )
        assert sm._lastFoldEngine == "distributedScan"
        return out.toPandas(), ["state_mean"], ["stateKey", "stateIndex", "stepIndex"]

    cases = [
        ("lkf", spark_lkf, est._KF_1D_SQL),
        ("lkf_dist", spark_lkf_dist, est._KF_1D_SQL),
        ("smoother", spark_smoother, est._SMOOTHER_1D_SQL),
        ("smoother_dist", spark_smoother_dist, est._SMOOTHER_1D_SQL),
    ]
    for name, fn, raw_sql in cases:
        raw, cols, keys = fn()
        ddf = duckdb_frame(raw_sql, sf_dir)
        merged = ddf.merge(raw, on=keys, suffixes=("_d", "_s"), validate="1:1")
        assert len(merged) == len(ddf) == len(raw), name
        for c in cols:
            dev = np.abs(merged[f"{c}_d"] - merged[f"{c}_s"]).max()
            assert dev < 1e-10, f"{name}.{c}@{sf_dir}: scan deviation {dev:.3e}"
            v = merged[f"{c}_d"].to_numpy()
            scaled = v * 1e4
            dist = (np.abs(scaled - np.floor(scaled) - 0.5) * 1e-4).min()
            assert dist > MIN_SAFETY_FACTOR * max(dev, 1e-15), (
                f"{name}.{c}@{sf_dir}: 4dp boundary distance {dist:.3e} "
                f"vs scan deviation {dev:.3e}"
            )
