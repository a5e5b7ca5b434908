"""Streaming drift monitor: PSI per event-time window against the FROZEN
reference distribution persisted by ``plans.temporal.persist_psi_reference``
— the monitoring twin of ``score_against_psi_reference`` for a live feed
("alert when today's traffic stops looking like the reference").

Pipeline shape (all stream-safe):

    stream ─> stream-static broadcast join to the reference EDGES
              (row-wise bin assignment, the identical clamped binning as
              the batch scorer)
           ─> windowed keyed bin counts   groupBy(window(ts), key, bin)
           ─> per-window finalize         groupBy(window, key): bin->count
              map + total (CHAINED streaming aggregation — supported for
              watermarked window aggs)
           ─> stateless PSI projection    one in-row fold over the
              reference probability array (bins entries, broadcast from
              the store), so bins the window never produced still
              contribute their smoothed zero term

State is (windows in flight) x keys x bins counters — bounded, evicted by
the watermark. The final fold runs on rows that are already one-per-
(window, key); nothing corpus-sized survives the first aggregate.

Equality contract (pinned by test): for every emitted (window, key) row,
``psi`` equals the batch ``score_against_psi_reference`` on exactly that
window's slice of the input (float-noise tolerance: the batch scorer sums
bin terms in hash-aggregate order, the stream folds them in bin order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.plans.temporal import PSI_SMOOTH


def streaming_psi(
    spark: SparkSession,
    stream: DataFrame,
    store_dir: str,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    window: str = "7 days",
    watermark: str = "0 seconds",
) -> DataFrame:
    """PSI of each (event-time window, key) of ``stream`` against the
    frozen reference store. Returns a streaming DataFrame
    (window_start, window_end, key, n_cur, psi) — append mode, rows
    finalize when the watermark passes the window."""
    store = spark.read.parquet(store_dir + "/psi_ref")
    bins = int(store.groupBy("key").count().first()["count"])
    edges = store.groupBy("key").agg(
        F.first("mn").alias("__mn__"), F.first("mx").alias("__mx__")
    )
    # per-key reference probabilities as one bin-ordered array
    prefs = store.groupBy("key").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("bin", "p_ref"))), lambda s: s["p_ref"]
        ).alias("__pref__")
    )

    raw = F.try_divide(F.col(value_col) - F.col("__mn__"), F.col("__mx__") - F.col("__mn__"))
    b = F.least(F.greatest(F.floor(raw * bins), F.lit(0)), F.lit(bins - 1))
    binned = (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.col(key_col).alias("key"), F.col(value_col))
        .join(F.broadcast(edges), "key")
        .select("key", ts_col, F.coalesce(b, F.lit(0)).cast("long").alias("bin"))
    )
    counted = binned.groupBy(F.window(ts_col, window).alias("w"), "key", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    finalized = counted.groupBy("w", "key").agg(
        F.map_from_entries(F.collect_list(F.struct("bin", "c"))).alias("__m__"),
        F.sum("c").alias("n_cur"),
    )

    n = F.col("n_cur").cast("double")
    denom = n + F.lit(PSI_SMOOTH * bins)
    psi = F.aggregate(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + (
            lambda pc, pr: (pc - pr) * F.log(pc / pr)
        )(
            (
                F.coalesce(F.element_at("__m__", i.cast("long")), F.lit(0)).cast("double")
                + F.lit(PSI_SMOOTH)
            )
            / denom,
            F.element_at("__pref__", i.cast("int") + 1),
        ),
    )
    return (
        finalized.join(F.broadcast(prefs), "key")
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("key").alias(key_col),
            "n_cur",
            psi.alias("psi"),
        )
    )
