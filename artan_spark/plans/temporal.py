"""Temporal join operators over the ``events`` table.

As-of (point-in-time) joins are a staple of feature/training-data pipelines
that Spark's relational API lacks as a primitive. The implementation here is
the classic distributed formulation — union both sides, one hash shuffle on
the group key, and a running ``last`` window over the time-sorted stream —
so the plan is a single exchange + sort regardless of data size: exactly
what you want for a 100 TB fact table co-partitioned by user. No UDFs, no
driver collect; everything stays in whole-stage codegen.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` (semantics: greatest right.ts <=
left.ts per group, inclusive), which pins our window construction to an
independently-implemented reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artan_spark.sources import read_table

_SIDE = "__asof_side__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    payload: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` (inclusive) in the same ``by`` group.

    ``right`` must carry the ``by`` and ``on`` columns plus ``payload``
    columns whose names don't collide with ``left``'s (alias them first).
    Left rows with no prior right row get nulls. If ``right`` can hold
    several rows at the same (by, on), the pick among them is unspecified —
    pre-aggregate to one row per (by, on) for a deterministic result
    (``events_asof_join`` does this with a max() agg).

    Scale shape: ``unionByName`` is a zero-shuffle concat; the window is ONE
    hash exchange on ``by`` + a per-partition sort — the same cost as any
    keyed aggregation over the fact table, independent of how many right
    rows match. Skewed groups can be pre-salted by the caller like any
    window; there is no cross-product blow-up anywhere (contrast a naive
    ``left.ts >= right.ts`` range join, which is quadratic per group).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    l = left.withColumn(_SIDE, F.lit(1))
    r = right.select(*by_cols, on, *payload).withColumn(_SIDE, F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at equal `on`, making the match
    # inclusive (a right row at exactly left.ts is visible to that left row)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload:
        u = u.withColumn(c, F.last(F.when(F.col(_SIDE) == 0, F.col(c)), ignorenulls=True).over(w))
    return u.filter(F.col(_SIDE) == 1).drop(_SIDE)


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature attach: every event gets the value/time of the
    user's most recent purchase at or before the event."""
    e = read_table(spark, sf_dir, "events")
    left = e.select("event_id", "user_id", "ts", "value")
    # Deduplicate the build side to one row per (user_id, ts): when two
    # purchases share a timestamp, both Spark's running-last window and
    # DuckDB's ASOF JOIN pick arbitrarily — a max(value) agg makes the pick
    # deterministic on both sides (the oracle mirrors this GROUP BY).
    right = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
        .select("user_id", "ts", "last_purchase_value", F.col("ts").alias("last_purchase_ts"))
    )
    out = asof_join(left, right, on="ts", by="user_id", payload=["last_purchase_value", "last_purchase_ts"])
    return out.select("event_id", "user_id", "ts", "value", "last_purchase_value", "last_purchase_ts")


_ASOF_SQL = """
SELECT e.event_id, e.user_id, e.ts, e.value,
       p.value AS last_purchase_value, p.ts AS last_purchase_ts
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, max(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
) p ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    lower_s: int,
    upper_s: int,
    bucket_s: int,
) -> DataFrame:
    """All (left, right) pairs in the same ``by`` group with
    ``right[on] - left[on]`` in ``[lower_s, upper_s]`` seconds.

    A naive ``l.by = r.by AND r.on BETWEEN ...`` plan degenerates to a
    per-group cross product (BroadcastNestedLoop at worst). Instead each
    left row is exploded to the ceil((upper-lower)/bucket)+1 time buckets
    its window can touch, the join becomes an EQUI-join on
    (by, bucket) — hash-shuffleable, AQE/skew-aware — and the exact
    interval predicate refines the candidates. Work scales with
    matches-per-bucket, not group size squared.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    n_buckets = (upper_s - lower_s) // bucket_s + 2
    lsec = F.unix_timestamp(F.col(on))
    l = left.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                ((lsec + lower_s) / bucket_s).cast("long"),
                ((lsec + upper_s) / bucket_s).cast("long"),
            )
        ),
    )
    r = right.withColumn("__bucket__", (F.unix_timestamp(F.col(on)) / bucket_s).cast("long"))
    assert n_buckets <= 16, "widen bucket_s: explosion factor too large"
    lo = F.col(f"l.{on}") + F.expr(f"INTERVAL {lower_s} SECONDS")
    hi = F.col(f"l.{on}") + F.expr(f"INTERVAL {upper_s} SECONDS")
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            [F.col(f"l.{c}") == F.col(f"r.{c}") for c in by_cols]
            + [
                F.col("l.__bucket__") == F.col("r.__bucket__"),
                F.col(f"r.{on}") >= lo,
                F.col(f"r.{on}") <= hi,
            ],
        )
        .drop("__bucket__")
    )


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: error events within 6 hours AFTER a purchase by the
    same user — purchase-to-problem attribution, the canonical range-join
    workload (window sized to this corpus's ~10h inter-event gap per user so
    the result is non-trivial at every SF)."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), "ts", F.col("value").alias("error_value")
    )
    joined = range_join(purchases, errors, on="ts", by="user_id", lower_s=0, upper_s=21600, bucket_s=21600)
    return joined.select(
        F.col("l.user_id").alias("user_id"),
        "purchase_id",
        "error_id",
        F.col("r.error_value").alias("error_value"),
    )


_RANGE_SQL = """
SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id,
       e.value AS error_value
FROM events p JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 21600 SECONDS
"""


SESSION_GAP = "30 minutes"


def sessionize(df: DataFrame, on: str, by: str | list[str], gap: str = SESSION_GAP):
    """Group rows into per-key activity sessions: maximal runs where
    consecutive rows are within ``gap`` of each other (inclusive — a row at
    exactly ``prev + gap`` still merges, matching Spark's
    ``session_window`` semantics, pinned by test_temporal.py).

    Returns the grouped object (``groupBy(by..., session_window)``) so the
    caller picks the aggregates. Works identically on batch and streaming
    input — in streaming, add a watermark on ``on`` first and Spark keeps
    one open-session state per key, merged/evicted by the watermark: the
    canonical sessionization operator of an events pipeline.

    Scale shape: ONE hash exchange on the ``by`` key + per-partition sort
    (the same cost as any keyed window), then sessions merge locally.
    No self-join, no cross product; skewed users salt like any keyed agg.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    return df.groupBy(*by_cols, F.session_window(F.col(on), gap))


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity sessions (30-min inactivity gap): start/end, event
    count, summed value. The session end is ``last event + gap`` (Spark's
    session_window contract; the oracle mirrors it)."""
    e = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return (
        sessionize(e, on="ts", by="user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# gaps-and-islands: a session break iff the gap to the previous event is
# STRICTLY greater than 30 minutes (Spark merges at exactly the boundary);
# event_id in both ORDER BYs keeps lag() and the running sum on one
# deterministic tie order
_SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk,
         event_id
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS session_value
FROM s GROUP BY user_id, sid
"""


QUERIES = {
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
}
ORACLES = {
    "events_asof_join": _ASOF_SQL,
    "events_range_join": _RANGE_SQL,
}
# registry is at the driver's 50-entry cap - sessionization keeps a
# pytest-side oracle (tests/test_oracle.py) like the other beyond-cap ops
PYTEST_ORACLES = {
    "events_sessionize": (events_sessionize, _SESSIONIZE_SQL),
}


# -- rolling z-score anomaly detection -----------------------------------------

ANOMALY_WINDOW = 20  # trailing events per user in the baseline
ANOMALY_MIN_N = 5  # baseline must have at least this many events
ANOMALY_Z = 3.0  # |z| at or past this flags the event


def rolling_zscore(
    df: DataFrame,
    value_col: str = "value",
    by: str = "user_id",
    order: tuple[str, str] = ("ts", "event_id"),
    window: int = ANOMALY_WINDOW,
    min_n: int = ANOMALY_MIN_N,
) -> DataFrame:
    """Per-key rolling z-score of ``value_col`` against the trailing
    ``window`` events (EXCLUDING the current one — the baseline must not
    contain the point being judged). Rows with fewer than ``min_n``
    baseline events get no score (warm-up). Zero-variance baselines yield
    NULL (try_divide), not a flag.

    The classical anomaly baseline that complements the model-based
    estimation family (Kalman innovation/mahalanobis): no state to fit,
    one hash exchange on the key + a per-partition sort — the same cost
    as any keyed window; works identically as a batch backfill or a
    foreachBatch scoring pass.
    """
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(order[0]).asc(), F.col(order[1]).asc())
        .rowsBetween(-window, -1)
    )
    return (
        df.withColumn("mu", F.avg(value_col).over(w))
        .withColumn("sd", F.stddev_samp(value_col).over(w))
        .withColumn("n_baseline", F.count(F.lit(1)).over(w))
        .filter(F.col("n_baseline") >= min_n)
        .withColumn("z", F.try_divide(F.col(value_col) - F.col("mu"), F.col("sd")))
    )


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: events whose value sits >= ``ANOMALY_Z`` trailing
    standard deviations from the user's own recent baseline."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    z = rolling_zscore(e)
    return z.filter(F.abs(F.col("z")) >= ANOMALY_Z).select(
        "user_id",
        "event_id",
        "value",
        F.col("n_baseline").cast("long").alias("n_baseline"),
        F.round("z", 6).alias("z_score"),
    )


_ANOMALY_SQL = f"""
WITH w AS (
  SELECT user_id, event_id, value,
         AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN {ANOMALY_WINDOW} PRECEDING AND 1 PRECEDING) AS mu,
         stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN {ANOMALY_WINDOW} PRECEDING AND 1 PRECEDING) AS sd,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN {ANOMALY_WINDOW} PRECEDING AND 1 PRECEDING) AS n_baseline
  FROM events
),
z AS (
  SELECT user_id, event_id, value, n_baseline,
         (value - mu) / NULLIF(sd, 0) AS z
  FROM w WHERE n_baseline >= {ANOMALY_MIN_N}
)
SELECT user_id, event_id, value, n_baseline, ROUND(z, 6) AS z_score
FROM z WHERE abs(z) >= {ANOMALY_Z}
"""

# r12 window rotation: promoted to the driver window (the anomaly family
# had never been hard-gate-checked)
QUERIES["events_anomaly_zscore"] = events_anomaly_zscore
ORACLES["events_anomaly_zscore"] = _ANOMALY_SQL


# -- robust (median/MAD) anomaly scores ----------------------------------------

MAD_SCALE = 1.4826  # Phi^-1(3/4) reciprocal: MAD -> sigma under normality
ROBUST_Z = 3.5  # the classical Iglewicz-Hoaglin cutoff


def events_anomaly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomalies: |value - median| measured in MAD units
    (z = (v - med) / (1.4826 * MAD), flag at |z| >= 3.5). The
    outlier-resistant complement of ``events_anomaly_zscore`` — a handful
    of extreme points inflate a mean/stddev baseline enough to mask each
    other; the median/MAD baseline is immune to <50% contamination.

    Scale shape: two grouped EXACT medians (Spark's median == exact
    percentile since 3.4; each is one hash exchange on the key + per-group
    sort of that key's values) and two key-table joins back. Both engines
    interpolate even counts as (a+b)/2 on identical doubles, so med/MAD
    are bit-equal cross-engine and z is a quotient of identical scalars.
    """
    e = read_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    med = e.groupBy("user_id").agg(F.median("value").alias("med"))
    dev = e.join(med, "user_id").withColumn("d", F.abs(F.col("value") - F.col("med")))
    mad = dev.groupBy("user_id").agg(F.median("d").alias("mad"))
    z = F.try_divide(F.col("value") - F.col("med"), F.lit(MAD_SCALE) * F.col("mad"))
    return (
        dev.join(mad, "user_id")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= ROBUST_Z)
        .select("user_id", "event_id", "value", F.round("z", 6).alias("robust_z"))
    )


_ANOMALY_ROBUST_SQL = f"""
WITH med AS (SELECT user_id, median(value) AS med FROM events GROUP BY 1),
dev AS (SELECT e.user_id, e.event_id, e.value, m.med, abs(e.value - m.med) AS d
        FROM events e JOIN med m USING (user_id)),
mad AS (SELECT user_id, median(d) AS mad FROM dev GROUP BY 1),
z AS (SELECT dev.user_id, event_id, value,
             (value - med) / NULLIF({MAD_SCALE} * mad.mad, 0) AS z
      FROM dev JOIN mad ON dev.user_id = mad.user_id)
SELECT user_id, event_id, value, ROUND(z, 6) AS robust_z
FROM z WHERE abs(z) >= {ROBUST_Z}
"""

PYTEST_ORACLES["events_anomaly_robust"] = (events_anomaly_robust, _ANOMALY_ROBUST_SQL)


# -- CUSUM drift detection -----------------------------------------------------

CUSUM_K = 0.5  # slack, in per-user sigma units (tuned for ~1-sigma shifts)
CUSUM_H = 4.0  # alarm threshold, in sigma units


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM drift report: the largest upward/downward cumulative
    drift of ``value`` from the user's own mean, in sigma units, with
    alarms at ``CUSUM_H``. Detects the slow persistent shifts a point
    z-score never sees (each step small, the SUM diagnostic).

    Spark-first trick: the CUSUM recursion S_i = max(0, S_{i-1} + d_i) has
    the closed form S_i = P_i - min(0, min_{j<=i} P_j) over the prefix sums
    P — so the whole operator is TWO stacked running windows (cumsum, then
    running min), pure Catalyst, no fold, no Python, no extra shuffle
    beyond the one keyed exchange. Both engines accumulate the prefix sums
    over the identical (ts, event_id) order.
    """
    e = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    per_user = Window.partitionBy("user_id")
    base = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.avg("value").over(per_user).alias("mu"),
        F.stddev_samp("value").over(per_user).alias("sd"),
    )
    d = base.select(
        "user_id",
        "event_id",
        "ts",
        F.try_divide(F.col("value") - F.col("mu") - CUSUM_K * F.col("sd"), F.col("sd")).alias("du"),
        F.try_divide(F.col("mu") - CUSUM_K * F.col("sd") - F.col("value"), F.col("sd")).alias("dd"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = d.select(
        "user_id", "event_id", "ts", F.sum("du").over(run).alias("pu"), F.sum("dd").over(run).alias("pd")
    )
    s = p.select(
        "user_id",
        (F.col("pu") - F.least(F.lit(0.0), F.min("pu").over(run))).alias("su"),
        (F.col("pd") - F.least(F.lit(0.0), F.min("pd").over(run))).alias("sd"),
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max("su"), 6).alias("max_cusum_up"),
        F.round(F.max("sd"), 6).alias("max_cusum_down"),
        (F.max("su") >= CUSUM_H).alias("alarm_up"),
        (F.max("sd") >= CUSUM_H).alias("alarm_down"),
    )


_CUSUM_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, ts, value,
         AVG(value) OVER (PARTITION BY user_id) AS mu,
         stddev_samp(value) OVER (PARTITION BY user_id) AS sd
  FROM events
),
d AS (
  SELECT user_id, event_id, ts,
         (value - mu - {CUSUM_K} * sd) / NULLIF(sd, 0) AS du,
         (mu - {CUSUM_K} * sd - value) / NULLIF(sd, 0) AS dd
  FROM base
),
p AS (
  SELECT user_id, event_id, ts,
         SUM(du) OVER run AS pu, SUM(dd) OVER run AS pd
  FROM d
  WINDOW run AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT user_id,
         pu - LEAST(0, MIN(pu) OVER run) AS su,
         pd - LEAST(0, MIN(pd) OVER run) AS sd
  FROM p
  WINDOW run AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, COUNT(*) AS n_events,
       ROUND(MAX(su), 6) AS max_cusum_up,
       ROUND(MAX(sd), 6) AS max_cusum_down,
       (MAX(su) >= {CUSUM_H}) AS alarm_up,
       (MAX(sd) >= {CUSUM_H}) AS alarm_down
FROM s GROUP BY user_id
"""

PYTEST_ORACLES["events_cusum_drift"] = (events_cusum_drift, _CUSUM_SQL)


# -- PSI distribution drift ----------------------------------------------------

PSI_BINS = 10
PSI_SMOOTH = 0.5  # additive count smoothing so empty bins stay finite


def psi_report(
    ref: DataFrame, cur: DataFrame, key_col: str, value_col: str, bins: int = PSI_BINS
) -> DataFrame:
    """Population Stability Index of ``value_col`` per ``key_col`` between
    a reference snapshot and a current one — the standard drift score for
    "did yesterday's ingest change the distribution" checks (PSI < 0.1
    stable, 0.1-0.25 moderate, > 0.25 major shift, the usual reading).

    Bins are ``bins`` equal-width cells of the REFERENCE value range per
    key (current values outside it clamp into the edge cells — by
    construction of the drift question, the grid must come from the
    reference side only); probabilities are additively smoothed
    ``(c + 0.5) / (n + 0.5 * bins)`` so empty cells contribute a finite
    term. The PSI column is emitted UNROUNDED: every arithmetic step runs
    on identical operands in both engines, so parity needs no rounding and
    therefore no margin guard.

    Scale shape: one pass per side (hash agg on (key, bin)); the per-key
    bin edges and totals are key-cardinality-sized broadcast-backs; the
    final PSI sums a keys x bins frame. Nothing corpus-sized shuffles
    twice."""
    edges = ref.groupBy(key_col).agg(
        F.min(value_col).alias("__mn__"), F.max(value_col).alias("__mx__")
    )

    def binned(side: DataFrame, name: str) -> DataFrame:
        # try_divide: a degenerate single-valued reference range (mx == mn)
        # must yield NULL -> bin 0, not IEEE Inf/NaN (engines disagree on
        # casting those to integers)
        raw = F.try_divide(
            F.col(value_col) - F.col("__mn__"), F.col("__mx__") - F.col("__mn__")
        )
        b = F.least(
            F.greatest(F.floor(raw * bins), F.lit(0)), F.lit(bins - 1)
        )
        return (
            side.join(F.broadcast(edges), key_col)
            .select(key_col, F.coalesce(b, F.lit(0)).cast("long").alias("bin"))
            .groupBy(key_col, "bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    grid = (
        edges.select(key_col)
        .select(key_col, F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"))
        .select(key_col, F.col("bin").cast("long").alias("bin"))
    )
    cells = (
        grid.join(binned(ref, "c_ref"), [key_col, "bin"], "left")
        .join(binned(cur, "c_cur"), [key_col, "bin"], "left")
        .select(
            key_col,
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    tot = Window.partitionBy(key_col)
    p_ref = (F.col("c_ref") + PSI_SMOOTH) / (F.sum("c_ref").over(tot) + PSI_SMOOTH * bins)
    p_cur = (F.col("c_cur") + PSI_SMOOTH) / (F.sum("c_cur").over(tot) + PSI_SMOOTH * bins)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        cells.select(key_col, F.col("c_ref").alias("cr"), F.col("c_cur").alias("cc"), term.alias("t"))
        .groupBy(key_col)
        .agg(
            F.sum("cr").alias("n_ref"),
            F.sum("cc").alias("n_cur"),
            F.sum("t").alias("psi"),
        )
    )


def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift report over the events table: PSI of ``value`` per
    event_type between the first and second half of the observed time
    range (the midpoint pivot is data-derived but deterministic)."""
    e = read_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    rng = e.agg(
        F.min(F.col("ts").cast("double")).alias("__lo__"),
        F.max(F.col("ts").cast("double")).alias("__hi__"),
    )
    tagged = e.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "value",
        (F.col("ts").cast("double") < (F.col("__lo__") + F.col("__hi__")) / 2).alias("is_ref"),
    )
    ref = tagged.filter(F.col("is_ref")).select("event_type", "value")
    cur = tagged.filter(~F.col("is_ref")).select("event_type", "value")
    return psi_report(ref, cur, "event_type", "value")


_PSI_SQL = f"""
WITH rng AS (
  SELECT MIN(extract(epoch FROM ts)) AS lo, MAX(extract(epoch FROM ts)) AS hi FROM events
),
tagged AS (
  SELECT event_type, value,
         extract(epoch FROM ts) < (lo + hi) / 2 AS is_ref
  FROM events, rng
),
edges AS (
  SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
  FROM tagged WHERE is_ref GROUP BY event_type
),
binned AS (
  SELECT t.event_type, t.is_ref,
         CAST(LEAST(GREATEST(COALESCE(
           FLOOR((t.value - e.mn) / NULLIF(e.mx - e.mn, 0) * {PSI_BINS}), 0), 0),
           {PSI_BINS - 1}) AS BIGINT) AS bin
  FROM tagged t JOIN edges e ON e.event_type = t.event_type
),
grid AS (
  SELECT event_type, CAST(g.range AS BIGINT) AS bin
  FROM edges, range({PSI_BINS}) g
),
cells AS (
  SELECT g.event_type, g.bin,
         COALESCE(SUM(CASE WHEN b.is_ref THEN 1 END), 0) AS c_ref,
         COALESCE(SUM(CASE WHEN NOT b.is_ref THEN 1 END), 0) AS c_cur
  FROM grid g
  LEFT JOIN binned b ON b.event_type = g.event_type AND b.bin = g.bin
  GROUP BY 1, 2
),
probs AS (
  SELECT event_type, c_ref, c_cur,
         (c_ref + {PSI_SMOOTH}) /
           (SUM(c_ref) OVER (PARTITION BY event_type) + {PSI_SMOOTH * PSI_BINS}) AS p_ref,
         (c_cur + {PSI_SMOOTH}) /
           (SUM(c_cur) OVER (PARTITION BY event_type) + {PSI_SMOOTH * PSI_BINS}) AS p_cur
  FROM cells
)
SELECT event_type,
       SUM(c_ref) AS n_ref,
       SUM(c_cur) AS n_cur,
       SUM((p_cur - p_ref) * ln(p_cur / p_ref)) AS psi
FROM probs GROUP BY event_type
"""

PYTEST_ORACLES["events_value_psi"] = (events_value_psi, _PSI_SQL)


def persist_psi_reference(
    ref: DataFrame, store_dir: str, key_col: str, value_col: str, bins: int = PSI_BINS
) -> None:
    """Freeze a reference snapshot for drift monitoring: per-key bin edges
    AND the reference bin probabilities, parquet at ``store_dir``. The
    train-once / score-daily contract of the serving family (quality
    model, eval index, sketch store): a daily batch is scored against the
    FROZEN distribution without re-reading the reference corpus. The
    store is keys x bins rows — metadata-sized however large the
    reference was."""
    edges = ref.groupBy(key_col).agg(
        F.min(value_col).alias("__mn__"), F.max(value_col).alias("__mx__")
    )
    raw = F.try_divide(F.col(value_col) - F.col("__mn__"), F.col("__mx__") - F.col("__mn__"))
    b = F.least(F.greatest(F.floor(raw * bins), F.lit(0)), F.lit(bins - 1))
    counts = (
        ref.join(F.broadcast(edges), key_col)
        .select(key_col, F.coalesce(b, F.lit(0)).cast("long").alias("bin"))
        .groupBy(key_col, "bin")
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    grid = edges.select(
        key_col, "__mn__", "__mx__", F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin")
    ).select(key_col, "__mn__", "__mx__", F.col("bin").cast("long").alias("bin"))
    tot = Window.partitionBy("key")
    full = (
        grid.join(counts, [key_col, "bin"], "left")
        .select(
            F.col(key_col).alias("key"),
            "bin",
            F.col("__mn__").alias("mn"),
            F.col("__mx__").alias("mx"),
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
        )
        .withColumn(
            "p_ref",
            (F.col("c_ref") + PSI_SMOOTH) / (F.sum("c_ref").over(tot) + PSI_SMOOTH * bins),
        )
    )
    full.write.mode("overwrite").parquet(store_dir + "/psi_ref")


def score_against_psi_reference(
    spark: SparkSession, store_dir: str, cur: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """PSI of ``cur`` against the frozen reference: (key, n_cur, psi) with
    the identical binning/smoothing as ``psi_report`` — scoring the
    ORIGINAL reference frame and scoring through the store agree exactly
    (pinned by test). One hash agg over the batch + a broadcast of the
    keys x bins store; bins count toward PSI even when the batch leaves
    them empty (the smoothed zero term), so a collapsed batch
    distribution reads as the major drift it is."""
    store = spark.read.parquet(store_dir + "/psi_ref")
    bins = int(store.groupBy("key").count().first()["count"])
    edges = store.groupBy("key").agg(F.first("mn").alias("__mn__"), F.first("mx").alias("__mx__"))
    raw = F.try_divide(F.col(value_col) - F.col("__mn__"), F.col("__mx__") - F.col("__mn__"))
    b = F.least(F.greatest(F.floor(raw * bins), F.lit(0)), F.lit(bins - 1))
    counts = (
        cur.select(F.col(key_col).alias("key"), F.col(value_col).alias(value_col))
        .join(F.broadcast(edges), "key")
        .select("key", F.coalesce(b, F.lit(0)).cast("long").alias("bin"))
        .groupBy("key", "bin")
        .agg(F.count(F.lit(1)).alias("c_cur"))
    )
    tot = Window.partitionBy("key")
    cells = (
        store.join(counts, ["key", "bin"], "left")
        .select("key", "p_ref", F.coalesce("c_cur", F.lit(0)).alias("c_cur"))
        .withColumn(
            "p_cur",
            (F.col("c_cur") + PSI_SMOOTH)
            / (F.sum("c_cur").over(tot) + PSI_SMOOTH * F.lit(int(bins))),
        )
    )
    term = (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref"))
    return (
        cells.select("key", "c_cur", term.alias("t"))
        .groupBy("key")
        .agg(F.sum("c_cur").alias("n_cur"), F.sum("t").alias("psi"))
        .withColumnRenamed("key", key_col)
    )
