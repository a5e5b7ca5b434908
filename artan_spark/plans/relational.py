"""Relational inventory: the Spark-SQL delegations of SURVEY §2.6 exercised
as real queries on the TPC-H-ish testdata, written scale-first.

Scale notes per query are in the docstrings: broadcast the dimension side,
partial-agg before shuffle (Spark does map-side combine for hash aggregates
automatically), filters live next to the scan so parquet pushdown applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.sources import read_table

# Exact-decimal money arithmetic for every rounded float SUM in this
# registry. The parquet doubles encode fixed-point decimals (TPC-H money =
# 2dp, rates = 2dp, events.value = 4dp); casting back to a decimal type
# recovers the exact value (cast margin: half an ulp vs a 0.005 boundary)
# and makes products and SUMs exact and summation-order-independent in BOTH
# engines — so a 2-dp ROUND of a sum can never flip on engine summation
# order. A float SUM here is a ~1%-per-value lottery: discount products are
# exact 4-dp decimals, so group sums land EXACTLY on a .xx5 rounding
# boundary at that rate, and the engines' float orders then disagree by an
# ulp on which side (r9: events_hypertable_rollup flipped exactly this way
# when the fixtures regenerated). TPC-H's native schema types these columns
# DECIMAL in the first place; decimal hash aggregation stays whole-stage
# codegen JVM-side at any scale. AVG columns divide the exact decimal sum
# (as double) by the count — one IEEE division on identical operands per
# engine — and tests/test_oracle_margins.py asserts every rounded quotient
# keeps a measured distance from its rounding boundary.
_EP = "decimal(12,2)"  # l_extendedprice (< 1.1e5) / o_totalprice
_PCT = "decimal(3,2)"  # l_discount / l_tax (0.00-0.99)
_VAL = "decimal(18,4)"  # events.value (4-dp measure)


def _ep_d():
    return F.col("l_extendedprice").cast(_EP)


def _disc_price_d():
    # (12,2) x (4,2) -> exact decimal, scale 4
    return _ep_d() * (F.lit(1).cast(_PCT) - F.col("l_discount").cast(_PCT))


def _charge_d():
    # x (4,2) -> exact decimal, scale 6
    return _disc_price_d() * (F.lit(1).cast(_PCT) + F.col("l_tax").cast(_PCT))


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)
_CHARGE_SQL = (
    _DISC_PRICE_SQL + " * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan + hash aggregate; predicate pushed to
    parquet; partial aggregation map-side; 4-row result. Money aggregates
    run in exact decimal (see the _EP block comment)."""
    l = read_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(_EP)), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_ep_d()), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(_disc_price_d()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_charge_d()), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(F.col("l_quantity").cast(_EP)).cast("double") / cnt, 6).alias("avg_qty"),
            F.round(F.sum(_ep_d()).cast("double") / cnt, 6).alias("avg_price"),
            F.round(F.sum(F.col("l_discount").cast(_PCT)).cast("double") / cnt, 6).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM({_CHARGE_SQL}), 2) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join customer x orders x lineitem; top-10 orders by revenue with
    deterministic tie-break. customer broadcast is left to the planner's
    size threshold (AQE is on): it broadcasts at bench scale but degrades
    gracefully to a shuffled join when the dimension outgrows the driver —
    a hard hint would pin the broadcast at any size. orders-lineitem
    co-shuffled on orderkey; top-k via TakeOrderedAndProject (no full
    sort)."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_disc_price_d()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey, o_orderdate,
       CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join. Fixed-cardinality dims (nation=25, region=5)
    carry explicit broadcast hints; customer/supplier grow with scale
    factor, so their broadcast is left to the planner's size threshold
    (broadcast at bench scale, shuffled join beyond it)."""
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price_d()), 2).cast("double").alias("revenue"))
    )


_Q5_SQL = f"""
SELECT n_name, CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global agg, zero joins — every
    predicate is scan-pushable (`PushedFilters` on date/discount/quantity),
    the textbook data-skipping query."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_ep_d() * F.col("l_discount").cast(_PCT)), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue-per-customer from returned items —
    selective lineitem filter (pushed to the scan), fact-fact join on
    orderkey, broadcast customer+nation dims, top-20 via
    TakeOrderedAndProject."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_disc_price_d()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass computes the rollup
    across time granularities (day, day+hour) per event type via grouping
    sets — the materialized-view shape a time-series store maintains
    incrementally. Spark executes it as a single Expand + hash aggregate
    (one shuffle for every granularity, partial agg map-side)."""
    e = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    hour = F.date_trunc("hour", F.col("ts"))
    # value is a 4-dp double (testdata contract); casting to DECIMAL(18,4)
    # recovers the exact decimal each double encodes (cast margin = half an
    # ulp vs a 5e-5 boundary), and SUM over decimals is exact and
    # summation-order-independent in both engines — a float SUM here flipped
    # the 2-dp ROUND on a .xx5-boundary group when the fixtures regenerated
    # (r9 verdict). The rounded sum is then deterministic at any scale.
    dec = F.col("value").cast("decimal(18,4)")
    return (
        e.select(day.alias("day"), hour.alias("hour"), dec.alias("value"))
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).cast("double").alias("sum_value"),
            F.round(F.max("value"), 2).cast("double").alias("max_value"),
        )
    )


_HYPERTABLE_SQL = """
SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value,
       CAST(ROUND(MAX(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS max_value
FROM events
GROUP BY ROLLUP (day, hour)
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: pull a typed field out of the JSON ``props``
    column and aggregate it — `get_json_object` stays JVM-side (codegen), no
    Python in the row path. All output aggregates are integers, so the
    oracle is exact with no rounding concerns."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


_JSON_EXTRACT_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       COUNT(DISTINCT k) AS n_distinct_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast part dim into lineitem; top-5 part types by revenue."""
    p = read_table(spark, sf_dir, "part")
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.round(F.sum(_disc_price_d()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_type"))
        .limit(5)
    )


_TOP_PARTS_SQL = f"""
SELECT p_type, CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
ORDER BY revenue DESC, p_type ASC
LIMIT 5
"""


def orders_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (grouping sets) on status x priority."""
    o = read_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast(_EP)), 2).cast("double").alias("total_price"),
    )


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def events_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event type (SURVEY §2.5
    window delegation). Window start aligns with epoch in both engines."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(_VAL)), 4).cast("double").alias("sum_value"),
            F.round(
                F.sum(F.col("value").cast(_VAL)).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value", "avg_value")
    )


_EVENTS_WINDOW_SQL = """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


def events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: per-user event sequencing + gap-based
    sessionization (30-min timeout), then session stats per user."""
    from pyspark.sql.window import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    with_gap = e.withColumn("new_session", (gap.isNull() | (gap > 1800)).cast("int"))
    with_session = with_gap.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("n_events"),
        )
    )


_EVENTS_SESSIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM per_session GROUP BY user_id
"""


def customer_order_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + null handling: customers with/without orders."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_EP)).alias("total_spent_d"),
    )
    return c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("total_spent_d").cast("double"), F.lit(0.0)).alias("total_spent"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )


_CUST_BALANCE_SQL = """
SELECT c_custkey, c_name,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(CAST(total_spent_d AS DOUBLE), 0.0) AS total_spent,
       ROUND(c_acctbal, 2) AS acctbal
FROM customer LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_spent_d
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
"""


def events_skew_safe_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: phase 1 aggregates
    (key, salt) partials, phase 2 merges per key — the standard fix when one
    hot key would otherwise pin a single reducer at 100 TB. Result is
    identical to the direct GROUP BY (the oracle proves it); avg is rebuilt
    from sum/count so the two-phase merge stays exact."""
    e = read_table(spark, sf_dir, "events")
    salted = e.withColumn("__salt__", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "__salt__").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum(F.col("value").cast(_VAL)).alias("ps"),  # exact decimal partials
        F.max("value").alias("pm"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pc").alias("n_events"),
            F.round(F.sum("ps"), 2).cast("double").alias("sum_value"),
            F.round(F.sum("ps").cast("double") / F.sum("pc"), 6).alias("avg_value"),
            F.round(F.max("pm"), 6).alias("max_value"),
        )
    )


_SKEW_SAFE_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_value,
       ROUND(MAX(value), 6) AS max_value
FROM events GROUP BY event_type
"""


def skew_safe_join(big: DataFrame, small: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Salted equi-join for a skewed big-side key: the standard fix when a
    hot key would pin one join task at 100 TB. The big side gets a
    deterministic salt in [0, n_salts); the SMALL side is exploded
    ``n_salts``-fold (fine — it's the small side) so every (key, salt)
    shard finds its match; the join runs on (key, salt), spreading a hot
    key over ``n_salts`` tasks. Row-identical to the plain equi-join for
    any salt count. AQE's skew-join split handles moderate skew on its
    own; this is the explicit form for the pathological single-key case
    (AQE cannot split one key's rows across tasks in a sort-merge join).
    """
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt__")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("__salt__", F.pmod(F.xxhash64(F.col(key)), F.lit(n_salts)))
    return big_salted.join(small_rep, [key, "__salt__"]).drop("__salt__")


def events_skew_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment event revenue via the salted join: events
    (big, skewed side) against customer (small dim) on user_id=custkey,
    then a per-segment rollup. The oracle is the PLAIN join — salting
    must be invisible in the result."""
    e = read_table(spark, sf_dir, "events")
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = skew_safe_join(e, c, "user_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast(_VAL)), 2).cast("double").alias("sum_value"),
    )


_SKEW_JOIN_SQL = """
SELECT c.c_mktsegment, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel (the canonical product-analytics query): how
    many users did view -> click -> purchase IN TIME ORDER, counting a
    step only if it happens strictly after the previous completed step's
    FIRST qualifying occurrence. Three filtered min-aggs per user (one
    per step, each conditioned on the prior step's timestamp), then one
    count row. 100-TB shape: each stage is a (user) hash agg over a
    predicate-pruned scan; per-user state is 3 timestamps, never an
    event list."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1, s2, s3 = FUNNEL_STEPS
    t1 = (
        e.filter(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        e.filter(F.col("event_type") == s2)
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        e.filter(F.col("event_type") == s3)
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{s1}"),
            F.sum(F.col("t2").isNotNull().cast("long")).cast("long").alias(f"n_{s2}"),
            F.sum(F.col("t3").isNotNull().cast("long")).cast("long").alias(f"n_{s3}"),
        )
    )


_FUNNEL_SQL = f"""
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > t2.t2
  GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_{FUNNEL_STEPS[0]},
       CAST(SUM(CASE WHEN t2.t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_{FUNNEL_STEPS[1]},
       CAST(SUM(CASE WHEN t3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_{FUNNEL_STEPS[2]}
FROM t1
LEFT JOIN t2 ON t2.user_id = t1.user_id
LEFT JOIN t3 ON t3.user_id = t1.user_id
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (the other canonical product-analytics
    grid): cohort = the week of a user's FIRST event; for each cohort and
    week offset, how many of its users were active. Two (user[, week])
    hash aggs + a broadcast-back of the user->cohort map; the output is
    cohorts x offsets rows, never user-sized."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    act = e.distinct()
    return (
        act.join(first, "user_id")
        .select(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


_RETENTION_SQL = """
WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
first AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id),
act AS (SELECT DISTINCT user_id, wk FROM e)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM act a JOIN first f ON f.user_id = a.user_id
GROUP BY 1, 2
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with a join-side predicate, COUNT over the nullable side, then a
    distribution over the counts — the canonical "how many customers
    placed k orders" histogram (the o_comment exclusion becomes an
    o_orderpriority exclusion on this schema). Two hash aggregates; the
    outer join shuffles on custkey and the second agg's key space is the
    count domain (tiny), so the output never scales with customers.

    Parity note: the reference delegates relational shapes to Spark SQL
    (artan exposes DataFrames; see SURVEY §2.6) — this extends the
    delegation inventory, not the §2 operator surface."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    counted = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            c["c_custkey"] == o["o_custkey"],
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counted.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist FROM c_orders GROUP BY c_count
"""


Q17_BRAND = "Brand#13"


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    scalar subquery ``l_quantity < 0.2 * (SELECT AVG(l_quantity) ... same
    part)`` decorrelated into a per-part aggregate joined back — the
    classic rewrite Catalyst itself performs for scalar subqueries.

    Exactness: the per-part average divides an exact DECIMAL quantity sum
    (as double) by the count — one IEEE division on identical operands per
    engine — and the final revenue is an exact decimal sum divided by 7.0,
    so no column needs rounding or a margin guard.

    Scale shape: the brand's part list is a broadcast semi-filter into the
    lineitem scan; the per-part averages are part-count-sized and broadcast
    back; ONE lineitem pass feeds both the average and the final filter."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND).select("p_partkey")
    l = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand_l = l.join(
        F.broadcast(p), l["l_partkey"] == p["p_partkey"], "inner"
    ).select("l_partkey", "l_quantity", "l_extendedprice").localCheckpoint()
    avg_q = brand_l.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast(_EP)).cast("double") / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    small = brand_l.join(F.broadcast(avg_q), "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return small.agg(
        (F.sum(_ep_d()).cast("double") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


_Q17_SQL = f"""
WITH brand_l AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
avg_q AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM brand_l GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lineitems
FROM brand_l b JOIN avg_q a ON a.l_partkey = b.l_partkey
WHERE b.l_quantity < 0.2 * a.avg_qty
"""


def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS-correlated
    subquery — count orders per priority in a quarter having at least one
    returned lineitem. The schema has no l_commitdate/l_receiptdate, so
    the qualifying-lineitem predicate is ``l_returnflag = 'R'``; the
    relational shape (semi-join decorrelation) is identical.

    Scale shape: Catalyst turns the EXISTS into a LEFT SEMI join — no
    duplication of the orders side however many lineitems match, and the
    lineitem scan reads only (l_orderkey, l_returnflag) with the flag
    filter pushed to parquet. Integer counts: exact, no margins."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_orderpriority")
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q12_priority_line_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority classes): fact-fact join
    with conditional aggregation — per lineitem status (standing in for
    the absent l_shipmode), how many joined orders are high-priority vs
    low. SUM(CASE ...) over integers: exact, no margins.

    Scale shape: both sides shuffle on orderkey (fact x fact — broadcast
    is wrong at scale); the CASE runs post-join in whole-stage codegen and
    the result key space is |linestatus| = 2."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_linestatus")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"], "inner")
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
         AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): conditional revenue ratio over
    one month — 100 * promo revenue / total revenue, where the "promo"
    class is the lexicographically-smallest p_type — DERIVED, not pinned
    (the driver fixtures carry a literal 'PROMO' class but the bench
    tier's self-generated data does not; a pinned literal made the
    numerator vacuously zero there).

    Exactness: both revenue sums are exact decimals; the ratio is ONE
    IEEE division on identical operands per engine — emitted unrounded.

    Scale shape: part is the dimension (broadcast, carrying a 1-row
    is-promo flag join); the month filter pushes to the lineitem scan;
    single hash aggregate."""
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo_type = p.agg(F.min("p_type").alias("promo_type"))
    p = p.join(F.broadcast(promo_type)).select(
        "p_partkey", (F.col("p_type") == F.col("promo_type")).alias("is_promo")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"], "inner")
    promo = F.when(F.col("is_promo"), _disc_price_d()).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(_disc_price_d()).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


_Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = (SELECT MIN(p_type) FROM part)
                             THEN {_DISC_PRICE_SQL}
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): NOT IN anti-join +
    multi-key COUNT(DISTINCT). The schema has no partsupp table, so
    lineitem is the part-supplier bridge; excluded suppliers are those in
    deficit (s_acctbal < 0, standing in for the complaints predicate).

    Scale shape: the exclusion list is supplier-sized — Catalyst plans a
    broadcast LEFT ANTI (null-aware NOT IN is safe here: the subquery
    column is a non-null key). COUNT(DISTINCT suppkey) expands per group;
    group key space is brand x type x size (bounded). Integer counts:
    exact."""
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 9, 19, 25, 38, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    l = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(bad, l["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"], "inner")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size IN (1, 9, 19, 25, 38, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar subquery
    threshold + NOT EXISTS anti-join — customers whose balance exceeds the
    positive-balance average and who placed no orders, rolled up by market
    segment (standing in for the absent phone country code).

    Exactness: the threshold divides an exact DECIMAL(12,2) balance sum
    (as double) by a count — identical operands per engine, so the filter
    selects identical rows; the output sum is again exact decimal.

    Scale shape: the threshold is a 1-row broadcast cross join; the
    NOT EXISTS is a LEFT ANTI on custkey (shuffle — orders is a fact);
    final agg key space is |mktsegment|."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = read_table(spark, sf_dir, "orders").select("o_custkey")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_EP)).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(_EP)), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


_Q22_SQL = """
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer, thr
WHERE c_acctbal > thr.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flow between two nations
    by year — lineitem joined to its SUPPLIER's nation and its ORDER's
    CUSTOMER's nation, symmetric pair filter, grouped by (from, to, year).

    Exactness: exact-decimal revenue sums; the year comes from an integer
    YEAR() both engines evaluate identically on identical timestamps.

    The nation pair is the two lexicographically-smallest names — DERIVED,
    not pinned: the bench tier's self-generated data carries real TPC-H
    nation names while the driver fixtures use NATION_n, and a literal pin
    returned 0 rows at sf1.0 (the derive-don't-pin regime applies to
    operator literals too).

    Scale shape: supplier/customer/nation are dimensions (broadcast, the
    2-row pair frame semi-joined into them); orders x lineitem is the one
    fact-fact shuffle (orderkey). The pair filter applies to the broadcast
    sides BEFORE the fact join, so non-qualifying rows never reach the
    shuffle."""
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = nat.select("n_name").orderBy("n_name").limit(2)
    sup = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .join(
            F.broadcast(pair.select(F.col("n_name").alias("supp_nation"))),
            "supp_nation",
            "left_semi",
        )
    )
    cus = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat["n_nationkey"])
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .join(
            F.broadcast(pair.select(F.col("n_name").alias("cust_nation"))),
            "cust_nation",
            "left_semi",
        )
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    j = (
        l.join(F.broadcast(sup), l["l_suppkey"] == sup["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cus), o["o_custkey"] == cus["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_disc_price_d()), 2).cast("double").alias("revenue"))
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(dp), 2) AS DOUBLE) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         YEAR(l_shipdate) AS l_year, {_DISC_PRICE_SQL} AS dp
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  WHERE ns.n_name IN (SELECT n_name FROM nation ORDER BY n_name LIMIT 2)
    AND nc.n_name IN (SELECT n_name FROM nation ORDER BY n_name LIMIT 2)
    AND ns.n_name <> nc.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): an aggregate VIEW joined against its
    own MAX — suppliers whose quarterly revenue equals the global maximum
    (the revenue-view + scalar-subquery form; exact decimals make the
    equality safe where a float sum would make it a coin flip).

    Scale shape: the revenue view is supplier-sized; its max is a 1-row
    broadcast; supplier joins by key. ONE lineitem pass — the view is
    localCheckpoint'd because BOTH its max and the equality filter read it
    (without the checkpoint Catalyst inlines the aggregation twice and the
    fact is scanned twice, which the plan audit caught)."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = (
        l.groupBy("l_suppkey")
        .agg(F.sum(_disc_price_d()).alias("total_revenue_d"))
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total_revenue_d").alias("mx"))
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["total_revenue_d"] == F.col("mx"))
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue_d", 2).cast("double").alias("total_revenue"),
        )
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({_DISC_PRICE_SQL}) AS total_revenue_d
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(ROUND(total_revenue_d, 2) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue_d = (SELECT MAX(total_revenue_d) FROM revenue)
"""


Q18_QTY = 180


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN-subquery over a HAVING
    aggregate — orders whose total lineitem quantity exceeds a threshold,
    joined back to customer detail. Catalyst plans the IN as a semi-join
    against the aggregated key set.

    Exactness: quantities are exact decimals; counts are integers.

    Scale shape: the HAVING aggregate is order-keyed (one fact pass,
    map-side combined); only qualifying orderkeys (rare by construction)
    reach the detail joins."""
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_EP)).alias("sum_qty_d"))
        .filter(F.col("sum_qty_d") > Q18_QTY)
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "inner")
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast(_EP).cast("double").alias("o_totalprice"),
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
        )
    )


_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       CAST(sum_qty_d AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_d
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {Q18_QTY}) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate): an
    OR-of-ANDs across both join sides — three (brand, size-range,
    quantity-range) alternatives. Catalyst splits the common conjuncts out
    of the OR and pushes them below the join (the Q19 optimization this
    shape exists to exercise); the p_size/p_brand legs prune the broadcast
    build side.

    Exactness: one exact-decimal revenue sum + an integer count."""
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    alt = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 35))
    )
    return j.filter(alt).agg(
        F.round(F.sum(_disc_price_d()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


_Q19_SQL = f"""
SELECT CAST(ROUND(SUM({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 35)
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): name-filtered parts traced
    through lineitem to the supplier's nation, profit grouped by (nation,
    order-year). The profit formula adapts to this schema (no partsupp):
    ``disc_price - 0.05 * p_retailprice * l_quantity`` — all exact
    decimals, so the 2dp round is boundary-deterministic. The name filter
    keeps parts whose first name-token is the lexicographically-smallest
    one — DERIVED, not pinned (the two data generators use different
    name vocabularies).

    Scale shape: part/supplier/nation broadcast (part pre-filtered by the
    1-row token semi); lineitem x orders is the one fact-fact shuffle."""
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.split(F.col("p_name"), " ").getItem(0).alias("tok")
    )
    tok = p.agg(F.min("tok").alias("tok"))
    p = p.join(F.broadcast(tok), "tok", "left_semi").select("p_partkey", "p_retailprice")
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    profit = _disc_price_d() - (
        F.lit(0.05).cast(_PCT)
        * F.col("p_retailprice").cast(_EP)
        * F.col("l_quantity").cast(_EP)
    )
    j = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
    )
    return j.groupBy("nation", F.year("o_orderdate").alias("o_year")).agg(
        F.round(F.sum(profit), 2).cast("double").alias("sum_profit")
    )


_Q9_SQL = f"""
SELECT nation, o_year, CAST(ROUND(SUM(profit), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
         {_DISC_PRICE_SQL}
           - (CAST(0.05 AS DECIMAL(3,2)) * CAST(p_retailprice AS DECIMAL(12,2))
              * CAST(l_quantity AS DECIMAL(12,2))) AS profit
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE split_part(p_name, ' ', 1)
        = (SELECT MIN(split_part(p_name, ' ', 1)) FROM part)
)
GROUP BY nation, o_year
"""


Q11_MEAN_MULTIPLE = 2.0


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value share within ONE
    nation's suppliers, kept when it exceeds a threshold share of the
    nation total — a grouped aggregate HAVING against a global scalar
    (1-row broadcast). The threshold is a MULTIPLE OF THE MEAN share
    (2x), not a fixed fraction: TPC-H itself scales Q11's fraction by
    1/SF because a constant goes vacuous as the part count grows (a
    pinned 0.002 returned 0 rows at sf1.0). The nation is the
    lexicographically-smallest name (derived); value = exact-decimal
    extendedprice sum over the nation's lineitems (this schema's stand-in
    for ps_supplycost * ps_availqty).

    Scale shape: ONE lineitem pass, checkpointed part-keyed aggregate read
    by both the total and the filter (the q15 single-scan discipline)."""
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    one = nat.orderBy("n_name").limit(1)
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .join(
            F.broadcast(one.select("n_name")), "n_name", "left_semi"
        )
        .select("s_suppkey")
    )
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    per_part = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_ep_d()).alias("value_d"))
        .localCheckpoint()
    )
    tot = per_part.agg(
        F.sum("value_d").alias("tot"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per_part.join(F.broadcast(tot))
        .filter(
            F.col("value_d").cast("double")
            > Q11_MEAN_MULTIPLE * F.col("tot").cast("double") / F.col("n_parts")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_d").cast("double").alias("value"),
        )
    )


_Q11_SQL = f"""
WITH nation_suppliers AS (
  SELECT s_suppkey FROM supplier JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = (SELECT MIN(n_name) FROM nation)
),
per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_d
  FROM lineitem JOIN nation_suppliers ON s_suppkey = l_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(value_d AS DOUBLE) AS value
FROM per_part
WHERE CAST(value_d AS DOUBLE)
      > {Q11_MEAN_MULTIPLE} * (SELECT CAST(SUM(value_d) AS DOUBLE) FROM per_part)
        / (SELECT COUNT(*) FROM per_part)
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated MIN subquery
    — for each qualifying part, the region's supplier(s) offering the
    minimum cost — decorrelated into a per-part minimum joined back
    (Catalyst's own rewrite). The part-supplier cost bridge is
    MIN(l_extendedprice) per (part, supplier) from lineitem (no partsupp
    on this schema); the region and the part size are DERIVED (smallest
    r_name / smallest p_size), never pinned.

    Exactness: costs and balances are exact decimals; the top-10 order is
    a total order (acctbal DESC, nation, supplier, part) so the LIMIT is
    deterministic.

    Scale shape: region->nation->supplier is a broadcast dimension chain
    that prefilters the bridge BEFORE the grouped min; the per-part min
    frame is part-sized and joins back by key; TakeOrdered, no full sort."""
    r = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rmin = r.orderBy("r_name").limit(1)
    nat = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).join(F.broadcast(rmin), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    sup = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    psz = p.agg(F.min("p_size").alias("p_size"))
    p = p.join(F.broadcast(psz), "p_size", "left_semi").select("p_partkey")
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cost = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(sup.select(F.col("s_suppkey").alias("l_suppkey"))),
            "l_suppkey",
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_ep_d()).alias("cost_d"))
        .localCheckpoint()  # read twice: per-part min + the equality join
    )
    pmin = cost.groupBy("l_partkey").agg(F.min("cost_d").alias("min_cost_d"))
    best = cost.join(F.broadcast(pmin), "l_partkey").filter(
        F.col("cost_d") == F.col("min_cost_d")
    )
    return (
        best.join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .select(
            F.col("s_acctbal").cast(_EP).cast("double").alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("p_partkey"),
            F.col("cost_d").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("nation"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(10)
    )


_Q2_SQL = """
WITH rsup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = (SELECT MIN(r_name) FROM region)
),
small_parts AS (
  SELECT p_partkey FROM part WHERE p_size = (SELECT MIN(p_size) FROM part)
),
cost AS (
  SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_d
  FROM lineitem
  JOIN small_parts ON p_partkey = l_partkey
  WHERE l_suppkey IN (SELECT s_suppkey FROM rsup)
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT c.* FROM cost c
  WHERE cost_d = (SELECT MIN(cost_d) FROM cost m WHERE m.l_partkey = c.l_partkey)
)
SELECT CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS s_acctbal,
       s_name, n_name AS nation, l_partkey AS p_partkey,
       CAST(cost_d AS DOUBLE) AS supply_cost
FROM best JOIN rsup ON rsup.s_suppkey = best.l_suppkey
ORDER BY s_acctbal DESC, nation ASC, s_name ASC, p_partkey ASC
LIMIT 10
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of a
    region's import volume by year — two-level conditional aggregation
    over a 5-table star. Region, target nation and order-year window are
    DERIVED (smallest r_name, smallest n_name inside it, the data's
    min year + 1..2), never pinned.

    Exactness: both volume sums are exact decimals; the share divides the
    two identical-operand doubles — emitted unrounded.

    Scale shape: all dimensions broadcast (customer prefiltered to the
    region before the fact join); orders x lineitem is the one fact-fact
    shuffle."""
    r = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rmin = r.orderBy("r_name").limit(1)
    nat = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    rnat = nat.join(
        F.broadcast(rmin), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    target = rnat.agg(F.min("n_name").alias("target_nation"))
    cus = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(rnat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    sup = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    yr = o.agg((F.min(F.year("o_orderdate")) + 1).alias("y0"))
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    j = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cus), o["o_custkey"] == cus["c_custkey"], "left_semi")
        .join(F.broadcast(sup), l["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(yr))
        .join(F.broadcast(target))
        .filter(F.year("o_orderdate").between(F.col("y0"), F.col("y0") + 1))
    )
    tgt = F.when(
        F.col("supp_nation") == F.col("target_nation"), _disc_price_d()
    ).otherwise(F.lit(0).cast("decimal(12,2)"))
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (
            F.sum(tgt).cast("double") / F.sum(_disc_price_d()).cast("double")
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


_Q8_SQL = f"""
WITH rmin AS (SELECT MIN(r_name) AS r_name FROM region),
rnat AS (
  SELECT n_nationkey, n_name FROM nation
  JOIN region ON r_regionkey = n_regionkey, rmin
  WHERE region.r_name = rmin.r_name
),
target AS (SELECT MIN(n_name) AS target_nation FROM rnat),
y AS (SELECT MIN(YEAR(o_orderdate)) + 1 AS y0 FROM orders)
SELECT YEAR(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN supp.n_name = target.target_nation
                     THEN {_DISC_PRICE_SQL} ELSE CAST(0 AS DECIMAL(12,2)) END)
            AS DOUBLE)
         / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation supp ON supp.n_nationkey = s_nationkey
CROSS JOIN target CROSS JOIN y
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_nationkey IN (SELECT n_nationkey FROM rnat))
  AND YEAR(o_orderdate) BETWEEN y.y0 AND y.y0 + 1
GROUP BY YEAR(o_orderdate)
"""


def q20_excess_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): a doubly-nested
    IN-subquery — suppliers of name-filtered parts whose shipping of some
    part CONCENTRATES in one year (> half their all-time quantity for that
    part shipped in the derived year — the availqty > 0.5*shipped
    predicate of the original, re-expressed on this schema's lineitem
    bridge). Selectors DERIVED: part name-token = the smallest first
    token, the year = data min year + 1, nation = the smallest nation
    that actually has suppliers.

    Exactness: decimal quantity sums; 0.5x is an exact decimal product;
    integer keys and strings everywhere else.

    Scale shape: the (part, supplier) aggregate is bridge-sized and built
    in ONE lineitem pass (conditional year sum beside the total — not two
    scans); excess pair suppkeys semi-join into the nation-filtered
    supplier dimension."""
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", F.split(F.col("p_name"), " ").getItem(0).alias("tok")
    )
    tok = p.agg(F.min("tok").alias("tok"))
    p = p.join(F.broadcast(tok), "tok", "left_semi").select("p_partkey")
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    y0 = l.agg((F.min(F.year("l_shipdate")) + 1).alias("y0"))
    qty_y = F.when(
        F.year("l_shipdate") == F.col("y0"), F.col("l_quantity").cast(_EP)
    ).otherwise(F.lit(0).cast(_EP))
    pairs = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"], "left_semi")
        .join(F.broadcast(y0))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty_y).alias("qty_y"),
            F.sum(F.col("l_quantity").cast(_EP)).alias("qty_tot"),
        )
        .filter(F.col("qty_y") > F.lit(0.5).cast("decimal(2,1)") * F.col("qty_tot"))
    )
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
    nmin = sup.agg(F.min("n_name").alias("n_name"))
    return (
        sup.join(F.broadcast(nmin), "n_name", "left_semi")
        .join(
            pairs.select(F.col("l_suppkey").alias("s_suppkey")).distinct(),
            "s_suppkey",
            "left_semi",
        )
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


_Q20_SQL = """
WITH tok AS (SELECT MIN(split_part(p_name, ' ', 1)) AS t FROM part),
tparts AS (SELECT p_partkey FROM part, tok WHERE split_part(p_name, ' ', 1) = tok.t),
y AS (SELECT MIN(YEAR(l_shipdate)) + 1 AS y0 FROM lineitem),
pairs AS (
  SELECT l_partkey, l_suppkey,
         SUM(CASE WHEN YEAR(l_shipdate) = y.y0
                  THEN CAST(l_quantity AS DECIMAL(12,2))
                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS qty_y,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_tot
  FROM lineitem, y
  WHERE l_partkey IN (SELECT p_partkey FROM tparts)
  GROUP BY l_partkey, l_suppkey, y.y0
),
nmin AS (
  SELECT MIN(n_name) AS n_name
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
)
SELECT s_name, n_name AS nation
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = (SELECT n_name FROM nmin)
  AND s_suppkey IN (SELECT l_suppkey FROM pairs
                    WHERE qty_y > CAST(0.5 AS DECIMAL(2,1)) * qty_tot)
ORDER BY s_name
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS / NOT-EXISTS double correlation — count, per supplier in the
    derived nation, the returned ('R') lineitems on MULTI-supplier orders
    where this supplier was the ONLY one with a returned line. The Spark
    side runs the decorrelated form (per-order distinct-supplier counts
    joined back — the rewrite Catalyst applies); the DuckDB oracle states
    the literal EXISTS/NOT-EXISTS form, so the parity check proves the
    two formulations agree row-for-row.

    Scale shape: the per-order counts aggregate ONE lineitem pass
    (conditional distinct beside total distinct); the verdict join is
    fact x order-sized on orderkey; supplier/nation broadcast; top-10 via
    TakeOrdered with a total (numwait DESC, s_name) order."""
    l = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_rsupp"),
    )
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
    nmin = sup.agg(F.min("n_name").alias("n_name"))
    sup = sup.join(F.broadcast(nmin), "n_name", "left_semi")
    waiting = (
        l.filter(F.col("l_returnflag") == "R")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


_Q21_SQL = """
WITH nmin AS (
  SELECT MIN(n_name) AS n_name
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
)
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = (SELECT n_name FROM nmin)
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "events_skew_safe_agg": events_skew_safe_agg,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_nation_revenue": q5_nation_revenue,
    "events_hypertable_rollup": events_hypertable_rollup,
    "events_user_activity": events_user_activity,
    # r11 window rotation: json_extract/top_parts/priority_rollup/
    # order_balance moved to the pytest gate after 9 stable rounds;
    # the funnel + three previously-unwindowed TPC-H shapes take the slots.
    # r12 rotation: q6/q10/events_window_stats (stable since r1/r2) move to
    # the pytest gate, freeing slots for never-window-checked families
    # (anomaly, KN perplexity, kNN join, C4, minhash decon, batch EM)
    "events_funnel": events_funnel,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q21_waiting_supplier": q21_waiting_supplier,
}

ORACLES = {
    "events_hypertable_rollup": _HYPERTABLE_SQL,
    "q1_pricing_summary": _Q1_SQL,
    "events_skew_safe_agg": _SKEW_SAFE_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_nation_revenue": _Q5_SQL,
    "events_user_activity": _EVENTS_SESSIONS_SQL,
    "events_funnel": _FUNNEL_SQL,
    "q13_customer_distribution": _Q13_SQL,
    "q17_small_quantity_revenue": _Q17_SQL,
    "q21_waiting_supplier": _Q21_SQL,
}

# registry is at the driver's 50-entry cap; the salted-join demo keeps a
# pytest oracle (the plain join — salting must be invisible in the result)
PYTEST_ORACLES = {
    "q6_forecast_revenue": (q6_forecast_revenue, _Q6_SQL),
    "q10_returned_items": (q10_returned_items, _Q10_SQL),
    "events_window_stats": (events_window_stats, _EVENTS_WINDOW_SQL),
    "events_skew_safe_join": (events_skew_safe_join, _SKEW_JOIN_SQL),
    "events_retention_cohorts": (events_retention_cohorts, _RETENTION_SQL),
    "events_json_extract": (events_json_extract, _JSON_EXTRACT_SQL),
    "top_parts_by_revenue": (top_parts_by_revenue, _TOP_PARTS_SQL),
    "orders_priority_rollup": (orders_priority_rollup, _ROLLUP_SQL),
    "customer_order_balance": (customer_order_balance, _CUST_BALANCE_SQL),
    "q4_order_priority_exists": (q4_order_priority_exists, _Q4_SQL),
    "q7_nation_volume": (q7_nation_volume, _Q7_SQL),
    "q15_top_supplier": (q15_top_supplier, _Q15_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, _Q18_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, _Q19_SQL),
    "q9_product_type_profit": (q9_product_type_profit, _Q9_SQL),
    "q11_important_stock": (q11_important_stock, _Q11_SQL),
    "q2_min_cost_supplier": (q2_min_cost_supplier, _Q2_SQL),
    "q8_market_share": (q8_market_share, _Q8_SQL),
    "q20_excess_shipping": (q20_excess_shipping, _Q20_SQL),
    "q12_priority_line_classes": (q12_priority_line_classes, _Q12_SQL),
    "q14_promo_revenue": (q14_promo_revenue, _Q14_SQL),
    "q16_supplier_part_variety": (q16_supplier_part_variety, _Q16_SQL),
    "q22_idle_customer_balance": (q22_idle_customer_balance, _Q22_SQL),
}
