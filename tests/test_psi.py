"""PSI drift report: planted-shift recovery, near-zero on identical
distributions, and a plain-numpy replay of the full computation.
(Oracle parity at sf0.001 is in test_oracle.py via PYTEST_ORACLES.)"""

import math

import numpy as np
import pytest

from artan_spark.plans.temporal import PSI_BINS, PSI_SMOOTH, events_value_psi, psi_report

SF_DIR = "/root/testdata/sf0.001"


def _np_psi(ref, cur, bins=PSI_BINS, smooth=PSI_SMOOTH):
    mn, mx = min(ref), max(ref)
    def bin_of(v):
        if mx == mn:
            return 0
        return min(max(int(math.floor((v - mn) / (mx - mn) * bins)), 0), bins - 1)
    cr = np.zeros(bins); cc = np.zeros(bins)
    for v in ref: cr[bin_of(v)] += 1
    for v in cur: cc[bin_of(v)] += 1
    pr = (cr + smooth) / (cr.sum() + smooth * bins)
    pc = (cc + smooth) / (cc.sum() + smooth * bins)
    return float(((pc - pr) * np.log(pc / pr)).sum())


def test_psi_replays_numpy(spark):
    rng = np.random.RandomState(7)
    ref_vals = [float(round(v, 3)) for v in rng.normal(10, 2, 400)]
    cur_vals = [float(round(v, 3)) for v in rng.normal(10.5, 2.5, 300)]
    ref = spark.createDataFrame([("k", v) for v in ref_vals], "k string, value double")
    cur = spark.createDataFrame([("k", v) for v in cur_vals], "k string, value double")
    row = psi_report(ref, cur, "k", "value").collect()[0]
    assert row["n_ref"] == 400 and row["n_cur"] == 300
    assert row["psi"] == pytest.approx(_np_psi(ref_vals, cur_vals), rel=1e-9)


def test_psi_identical_distribution_near_zero_and_planted_shift_large(spark):
    rng = np.random.RandomState(11)
    base = [float(round(v, 3)) for v in rng.uniform(0, 100, 500)]
    same = spark.createDataFrame([("k", v) for v in base], "k string, value double")
    stable = psi_report(same, same, "k", "value").collect()[0]["psi"]
    assert abs(stable) < 1e-12  # identical counts -> every term is zero
    shifted = spark.createDataFrame(
        [("k", v + 60.0) for v in base], "k string, value double"
    )
    drifted = psi_report(same, shifted, "k", "value").collect()[0]["psi"]
    assert drifted > 0.25  # a 60%-of-range shift is a major-drift PSI


def test_psi_out_of_range_current_clamps(spark):
    """Current values outside the reference range land in the edge bins
    instead of vanishing — n_cur must count every row."""
    ref = spark.createDataFrame([("k", float(v)) for v in range(10)], "k string, value double")
    cur = spark.createDataFrame([("k", -5.0), ("k", 99.0)], "k string, value double")
    row = psi_report(ref, cur, "k", "value").collect()[0]
    assert row["n_cur"] == 2


def test_psi_degenerate_reference_range(spark):
    """A single-valued reference (mx == mn) must not produce Inf/NaN."""
    ref = spark.createDataFrame([("k", 5.0)] * 4, "k string, value double")
    cur = spark.createDataFrame([("k", 5.0), ("k", 7.0)], "k string, value double")
    row = psi_report(ref, cur, "k", "value").collect()[0]
    assert math.isfinite(row["psi"]) and row["n_cur"] == 2


def test_psi_store_matches_inline(spark, tmp_path):
    """Scoring through the frozen reference store must equal psi_report on
    the original frames exactly (same binning, same smoothing)."""
    from artan_spark.plans.temporal import persist_psi_reference, score_against_psi_reference

    rng = np.random.RandomState(3)
    ref = spark.createDataFrame(
        [(f"k{i % 3}", float(round(v, 3))) for i, v in enumerate(rng.normal(5, 1, 300))],
        "grp string, value double",
    )
    cur = spark.createDataFrame(
        [(f"k{i % 3}", float(round(v, 3))) for i, v in enumerate(rng.normal(5.8, 1.2, 200))],
        "grp string, value double",
    )
    inline = {r["grp"]: (r["n_cur"], r["psi"]) for r in psi_report(ref, cur, "grp", "value").collect()}
    store_dir = str(tmp_path / "psi")
    persist_psi_reference(ref, store_dir, "grp", "value")
    stored = {
        r["grp"]: (r["n_cur"], r["psi"])
        for r in score_against_psi_reference(spark, store_dir, cur, "grp", "value").collect()
    }
    assert stored.keys() == inline.keys()
    for k in inline:
        assert stored[k][0] == inline[k][0]
        assert stored[k][1] == pytest.approx(inline[k][1], rel=1e-12)


def test_psi_store_empty_batch_key_reads_as_major_drift(spark, tmp_path):
    """A key the batch never produces any rows for simply drops out (no
    rows to score), but a key whose batch values all collapse into one
    bin must read as major drift against a spread reference."""
    from artan_spark.plans.temporal import persist_psi_reference, score_against_psi_reference

    ref = spark.createDataFrame(
        [("k", float(v)) for v in range(100)], "grp string, value double"
    )
    store_dir = str(tmp_path / "psi")
    persist_psi_reference(ref, store_dir, "grp", "value")
    collapsed = spark.createDataFrame([("k", 1.0)] * 50, "grp string, value double")
    row = score_against_psi_reference(spark, store_dir, collapsed, "grp", "value").collect()[0]
    assert row["n_cur"] == 50 and row["psi"] > 0.25


def test_events_psi_keys_complete(spark):
    rows = events_value_psi(spark, SF_DIR).collect()
    assert {r["event_type"] for r in rows} == {"click", "error", "purchase", "signup", "view"}
    assert all(math.isfinite(r["psi"]) for r in rows)
