"""Vocabulary / Zipf diagnostics — behavior tests (oracle parity runs in
test_oracle.py via PYTEST_ORACLES)."""

import math

import numpy as np


def test_planted_zipf_slope_recovered(spark):
    """A corpus whose token frequencies follow freq(r) = C / r exactly must
    fit slope -1; the other summary columns are exact counts."""
    vocab = 40
    words = []
    for r in range(1, vocab + 1):
        words += [f"w{r:03d}"] * max(1, round(200 / r))
    rng = np.random.default_rng(0)
    rng.shuffle(words)
    # spread the tokens over a few documents
    docs = [
        (i, " ".join(words[i::7]), "en") for i in range(7)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")

    import artan_spark.plans.textstats as ts

    # run the same plan body against the in-memory frame
    orig = ts.read_table
    try:
        ts.read_table = lambda _s, _d, _t: df
        out = ts.docs_zipf_stats(spark, "ignored").collect()
    finally:
        ts.read_table = orig
    [row] = out
    assert row["vocab_size"] == vocab
    assert row["total_tokens"] == sum(max(1, round(200 / r)) for r in range(1, vocab + 1))
    assert row["hapax_count"] == sum(
        1 for r in range(1, vocab + 1) if max(1, round(200 / r)) == 1
    )
    # rounding of 200/r makes the empirical law only approximately 1/r
    assert -1.15 < row["zipf_slope"] < -0.85
    assert row["type_token_ratio"] == round(row["vocab_size"] / row["total_tokens"], 6)


def test_slope_formula_matches_numpy_polyfit(spark):
    """The SUM-form OLS inside the query equals numpy's lstsq fit on the
    same (ln rank, ln freq) points."""
    cnts = [500, 260, 130, 80, 40, 20, 10, 5, 3, 2]
    x = np.log(np.arange(1, len(cnts) + 1, dtype=float))
    y = np.log(np.array(cnts, dtype=float))
    slope_np = np.polyfit(x, y, 1)[0]
    n = len(x)
    slope_sum = (n * np.sum(x * y) - x.sum() * y.sum()) / (
        n * np.sum(x * x) - x.sum() ** 2
    )
    assert math.isclose(slope_np, slope_sum, rel_tol=1e-12)
