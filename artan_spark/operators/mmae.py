"""Multiple-Model Adaptive Estimation aggregation.

Parity: /root/reference/src/main/scala/com/github/ozancicek/artan/ml/filter/
KalmanBase.scala:474-503 — weight per-key filter estimates by sliding
likelihood and aggregate to one estimate per ([window,] stateIndex).

Spark-native: one hash-shuffle groupBy + JVM higher-order-function fold
(collect_list + aggregate/zip_with) — no UDAF, no Python worker. At scale
this is a single shuffle keyed by (window, stateIndex) whose cardinality is
tiny compared to the input, with map-side partial collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artan_spark.functions import axpy_matrix_aggregate, axpy_vector_aggregate, array_to_matrix
from artan_spark.operators.base import EVENT_TIME


def mmae_aggregate(
    estimates: DataFrame,
    state_size: int,
    window_duration: str | None = None,
    event_time_col: str = EVENT_TIME,
) -> DataFrame:
    """Aggregate per-key estimates into a likelihood-weighted consensus."""
    keys = [F.col("stateIndex")]
    if window_duration:
        keys.insert(0, F.window(F.col(event_time_col), window_duration).alias(event_time_col))

    norm = F.lit(1.0) / F.sum("slidingLikelihood")
    mean_sum = axpy_vector_aggregate(F.col("slidingLikelihood"), F.col("state.mean"), state_size)
    cov_sum = axpy_matrix_aggregate(
        F.col("slidingLikelihood"), F.col("state.covariance"), state_size, state_size
    )
    out = estimates.groupBy(*keys).agg(
        F.transform(mean_sum, lambda v: v * norm).alias("mean"),
        F.transform(cov_sum["values"], lambda v: v * norm).alias("covValues"),
    )
    return out.select(
        *[c for c in ([event_time_col] if window_duration else [])],
        "stateIndex",
        F.struct(
            F.col("mean"),
            array_to_matrix(state_size, state_size, F.col("covValues")).alias("covariance"),
        ).alias("state"),
    )
