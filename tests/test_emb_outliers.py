"""Embedding outlier scan — behavior tests (oracle parity in test_oracle.py)."""

import numpy as np


def test_planted_outlier_flagged(spark):
    """A tight cluster plus one anti-aligned vector: only the planted
    outlier clears the z threshold, with the most negative z."""
    rng = np.random.default_rng(42)
    base = rng.standard_normal(8)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(30):
        v = base + 0.05 * rng.standard_normal(8)
        rows.append((i, [float(x) for x in v], 1))
    rows.append((99, [float(x) for x in -base], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    import artan_spark.plans.simsearch as ss

    orig = ss.read_table
    try:
        ss.read_table = lambda _s, _d, _t: df
        out = ss.embedding_outliers(spark, "ignored").collect()
    finally:
        ss.read_table = orig
    assert [r["vec_id"] for r in out] == [99]
    assert out[0]["z_score"] < -2.0
    assert out[0]["cos_centroid"] < 0


def test_uniform_cluster_flags_nothing(spark):
    """All vectors identical: zero variance, z undefined (NULL/NaN), and
    nothing may be flagged."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0], 0) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    import artan_spark.plans.simsearch as ss

    orig = ss.read_table
    try:
        ss.read_table = lambda _s, _d, _t: df
        out = ss.embedding_outliers(spark, "ignored").collect()
    finally:
        ss.read_table = orig
    assert out == []
