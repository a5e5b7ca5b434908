"""Multiple-Model Adaptive Estimation aggregation.

Parity: /root/reference/src/main/scala/com/github/ozancicek/artan/ml/filter/
KalmanBase.scala:474-503 — weight per-key filter estimates by sliding
likelihood and aggregate to one estimate per ([window,] stateIndex).

Spark-native: one hash-shuffle groupBy + JVM higher-order-function fold
(collect_list + aggregate/zip_with) — no UDAF, no Python worker. At scale
this is a single shuffle keyed by (window, stateIndex) whose cardinality is
tiny compared to the input, with map-side partial collect.

Weight normalization is done in max-shifted space: ``slidingLikelihood`` is
``exp(Σ window loglikelihoods)``, which underflows to exactly 0.0 for
poorly-fitting models; dividing by ``sum`` alone then raises DIVIDE_BY_ZERO
under ANSI mode when a whole group underflows. We instead divide every
weight by the group max first — algebraically ``exp(ll_i - ll_max)``, the
log-sum-exp max shift — so the best model always contributes weight 1.0 and
the normalizer is ≥ 1. Degenerate groups fall back deterministically:

- group max is 0/null (every model underflowed or never saw a measurement):
  uniform weights — no model is distinguishable, same as the reference's
  all-equal-likelihood behavior;
- group max is +inf (likelihood overflow, e.g. near-zero residual variance):
  indicator weights on the overflowed models (the finite ones are
  infinitely less likely).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artan_spark.functions import array_to_matrix
from artan_spark.operators.base import EVENT_TIME


def mmae_aggregate(
    estimates: DataFrame,
    state_size: int,
    window_duration: str | None = None,
    event_time_col: str = EVENT_TIME,
) -> DataFrame:
    """Aggregate per-key estimates into a likelihood-weighted consensus."""
    keys = [F.col("stateIndex")]
    out_keys = ["stateIndex"]
    if window_duration:
        keys.insert(0, F.window(F.col(event_time_col), window_duration).alias(event_time_col))
        out_keys.insert(0, event_time_col)

    items = F.collect_list(
        F.struct(
            F.col("slidingLikelihood").alias("w"),
            F.col("state.mean").alias("v"),
            F.col("state.covariance")["values"].alias("c"),
        )
    )
    agg = estimates.groupBy(*keys).agg(items.alias("items"))

    it = F.col("items")
    maxw = F.array_max(F.transform(it, lambda x: x["w"]))
    staged = agg.select(*out_keys, "items", maxw.alias("maxw"))

    mx = F.col("maxw")
    relw = (
        F.when(mx.isNull() | (mx <= 0.0), F.transform(it, lambda x: F.lit(1.0)))
        .when(
            mx == F.lit(math.inf),
            F.transform(it, lambda x: F.when(x["w"] == mx, F.lit(1.0)).otherwise(F.lit(0.0))),
        )
        .otherwise(F.transform(it, lambda x: F.coalesce(x["w"] / mx, F.lit(0.0))))
    )
    pairs = F.zip_with(
        relw,
        it,
        lambda r, x: F.struct(r.alias("r"), x["v"].alias("v"), x["c"].alias("c")),
    )
    staged = staged.select(*out_keys, pairs.alias("pairs"))

    p = F.col("pairs")
    # normalizer ≥ 1 by construction (max element contributes exactly 1.0;
    # uniform branch contributes group size) — ANSI-safe division
    norm = F.lit(1.0) / F.aggregate(p, F.lit(0.0), lambda a, x: a + x["r"])
    mean_sum = F.aggregate(
        p,
        F.array_repeat(F.lit(0.0), state_size),
        lambda acc, x: F.zip_with(acc, x["v"], lambda a, e: a + x["r"] * e),
    )
    cov_sum = F.aggregate(
        p,
        F.array_repeat(F.lit(0.0), state_size * state_size),
        lambda acc, x: F.zip_with(acc, x["c"], lambda a, e: a + x["r"] * e),
    )
    staged = staged.select(
        *out_keys,
        F.transform(mean_sum, lambda v: v * norm).alias("mean"),
        F.transform(cov_sum, lambda v: v * norm).alias("covValues"),
    )
    return staged.select(
        *out_keys,
        F.struct(
            F.col("mean"),
            array_to_matrix(state_size, state_size, F.col("covValues")).alias("covariance"),
        ).alias("state"),
    )
