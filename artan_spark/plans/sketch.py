"""Deterministic cardinality sketches over the ``events`` table.

KMV (k-minimum-values) distinct-count estimation: hash every element to a
uniform value, keep the k smallest distinct hashes per group, and estimate
``(k-1) / h_(k)`` where ``h_(k)`` is the k-th smallest hash normalized to
[0, 1). Unlike Spark's built-in ``approx_count_distinct`` (HLL++, whose
binary registers can't be reproduced in another engine), KMV with a fixed
portable hash is fully DETERMINISTIC — both engines compute the identical
estimate, so the sketch itself is value-hash oracle-checked, not just
smoke-tested.

Portable hash (verified cross-engine in round 1): the top 15 hex digits of
md5 read as a 60-bit integer —
Spark ``conv(substring(md5(x), 1, 15), 16, 10)`` ==
DuckDB ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``.

Scale: the only full shuffle is the per-group ``distinct`` (bounded by group
cardinality, map-side partial); the k-smallest selection is a per-group sort
of already-distinct hashes. Estimator error ~ 1/sqrt(k-2) (Bar-Yossef et al.
2002, "Counting distinct elements in a data stream").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artan_spark.sources import read_table

K = 32
_TWO60 = float(1 << 60)


def _portable_hash(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate (KMV, k=32) next to the exact
    count — the estimate is deterministic, so the oracle checks it to the
    last bit (one IEEE division on identical integer operands)."""
    e = read_table(spark, sf_dir, "events")
    h = e.select("event_type", _portable_hash(F.col("user_id")).alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= K)
    g = topk.groupBy("event_type").agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("kk"))
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    est = F.when(F.col("kk") < K, F.col("kk").cast("double")).otherwise(
        (F.lit(float(K - 1))) / (F.col("hk") / F.lit(_TWO60))
    )
    return (
        g.join(exact, "event_type")
        .select("event_type", "n_exact", est.alias("kmv_estimate"))
    )


_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
r AS (
  SELECT event_type, hv, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
g AS (
  SELECT event_type, MAX(hv) AS hk, COUNT(*) AS kk FROM r WHERE rn <= {K} GROUP BY 1
),
x AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT g.event_type, x.n_exact,
       CASE WHEN g.kk < {K} THEN CAST(g.kk AS DOUBLE)
            ELSE {float(K - 1)} / (g.hk / {_TWO60}) END AS kmv_estimate
FROM g JOIN x ON g.event_type = x.event_type
"""


M_REG = 64  # HLL registers (b=6 bucket bits)
_ALPHA_64 = 0.709  # HLL bias constant for m=64 (Flajolet et al. 2007)


def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HyperLogLog distinct-user estimate (m=64 registers)
    on the portable hash — like the KMV sketch, fully deterministic and
    therefore value-hash checkable cross-engine (unlike Spark's built-in
    HLL++ whose registers are engine-private).

    Determinism details: bucket = top 6 hash bits, rank = leading-zero
    count of the remaining 54 bits via ``length(bin(w))`` (integer string
    length, no float log2); the register sum Σ2^-M is computed EXACTLY in
    scaled integer arithmetic (Σ 2^(55-M) as BIGINT) so engine addition
    order cannot change the rounding; the small-range correction
    m·ln(m/V) is the one transcendental, absorbed by 4dp rounding.
    """
    e = read_table(spark, sf_dir, "events")
    h = e.select("event_type", _portable_hash(F.col("user_id")).alias("hv")).distinct()
    w = F.col("hv").bitwiseAND(F.lit((1 << 54) - 1))
    rank = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    regs = (
        h.select("event_type", F.shiftright("hv", 54).alias("bucket"), rank.alias("r"))
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m"))
    )
    g = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")).alias("sum_scaled"),
        F.count(F.lit(1)).alias("n_present"),
    )
    sum_scaled = F.col("sum_scaled") + (F.lit(M_REG) - F.col("n_present")) * F.lit(1 << 55)
    e_raw = F.lit(_ALPHA_64 * M_REG * M_REG) / (sum_scaled.cast("double") / F.lit(float(1 << 55)))
    v = F.lit(M_REG) - F.col("n_present")  # zero registers
    est = F.when(
        (e_raw <= F.lit(2.5 * M_REG)) & (v > 0),
        F.lit(float(M_REG)) * F.log(F.lit(float(M_REG)) / v.cast("double")),
    ).otherwise(e_raw)
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        g.join(exact, "event_type")
        .select("event_type", "n_exact", F.round(est, 4).alias("hll_estimate"))
    )


_HLL_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
regs AS (
  SELECT event_type, hv >> 54 AS bucket,
         MAX(CASE WHEN (hv & {(1 << 54) - 1}) = 0 THEN 55
                  ELSE 55 - length(bin(hv & {(1 << 54) - 1})) END) AS m
  FROM h GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         SUM(CAST(1 AS BIGINT) << (55 - m)) AS sum_scaled,
         COUNT(*) AS n_present
  FROM regs GROUP BY 1
),
x AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
),
est AS (
  SELECT g.event_type,
         {_ALPHA_64 * M_REG * M_REG} /
           (CAST(g.sum_scaled + ({M_REG} - g.n_present) * CAST({1 << 55} AS BIGINT) AS DOUBLE)
            / {float(1 << 55)}) AS e_raw,
         {M_REG} - g.n_present AS v
  FROM g
)
SELECT e.event_type, x.n_exact,
       ROUND(CASE WHEN e.e_raw <= {2.5 * M_REG} AND e.v > 0
                  THEN {float(M_REG)} * ln({float(M_REG)} / e.v)
                  ELSE e.e_raw END, 4) AS hll_estimate
FROM est e JOIN x ON e.event_type = x.event_type
"""


MG_CAPACITY = 256  # >= distinct user_ids at test SFs -> sketch is EXACT there
HH_K = 10


def events_heavy_hitters(
    spark: SparkSession, sf_dir: str, capacity: int = MG_CAPACITY, k: int = HH_K
) -> DataFrame:
    """Top-k heaviest users via a weighted Misra-Gries (space-saving)
    summary — THE bounded-memory heavy-hitters pattern for cardinalities
    where a full groupBy would shuffle billions of distinct keys.

    Per partition, ``mapInPandas`` folds the partition's Arrow batches into
    at most ``capacity`` counters (each batch pre-reduced by a VECTORIZED
    ``value_counts`` — the Python loop is over the batch's distinct items,
    never rows; overflow subtracts the minimum counter from all, the
    weighted MG step). Each counter satisfies ``f_p - D_p <= c <= f_p``
    where ``D_p`` is that partition's total decrement, and
    ``D_p <= partition_rows / (capacity + 1)``. Summaries then merge with a
    plain hash agg — counts add, error bounds add — so the global estimate
    obeys ``f - err_bound <= est <= f``: a one-pass, shuffle-light top-k
    with a DETERMINISTIC error certificate carried in the output.

    With ``capacity`` >= the true distinct count no decrement ever fires,
    every ``D_p`` is 0, and the sketch is EXACT — which is what the oracle
    checks at the test scale factors; the bounded-capacity error property
    is unit-tested separately.
    """
    import pandas as pd
    from pyspark import TaskContext

    def mg(batches):
        counters: dict = {}
        dec_total = 0
        for pdf in batches:
            for item, w in pdf["item"].value_counts().items():
                w = int(w)
                if item in counters:
                    counters[item] += w
                    continue
                counters[item] = w
                if len(counters) > capacity:
                    m = min(counters.values())
                    dec_total += m
                    counters = {i: c - m for i, c in counters.items() if c > m}
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {
                "pid": [pid] * len(counters),
                "item": list(counters.keys()),
                "cnt": list(counters.values()),
                "dec": [dec_total] * len(counters),
            }
        )

    ev = read_table(spark, sf_dir, "events")
    summ = ev.select(F.col("user_id").cast("string").alias("item")).mapInPandas(
        mg, "pid int, item string, cnt long, dec long"
    )
    merged = summ.groupBy("item").agg(F.sum("cnt").alias("est"))
    # one decrement total per partition; their sum is the global error bound
    err = summ.select("pid", "dec").distinct().agg(
        F.coalesce(F.sum("dec"), F.lit(0)).alias("err_bound")
    )
    w = Window.orderBy(F.desc("est"), F.asc("item"))
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .crossJoin(F.broadcast(err))
        .select(F.col("item").alias("user_id"), "est", "rank", "err_bound")
    )


# at the test SFs capacity >= distinct users, so the sketch output is the
# exact top-k with a zero error bound
_HH_SQL = f"""
SELECT CAST(user_id AS VARCHAR) AS user_id, est, rank, CAST(0 AS BIGINT) AS err_bound
FROM (
  SELECT user_id, COUNT(*) AS est,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, CAST(user_id AS VARCHAR) ASC) AS rank
  FROM events GROUP BY user_id
)
WHERE rank <= {HH_K}
"""


QS_CAPACITY = 4096  # summary points per (partition, group); >= partition-group rows at test SFs -> exact
QS_QUANTILES = (0.25, 0.5, 0.9)


def events_quantile_sketch(
    spark: SparkSession, sf_dir: str, capacity: int = QS_CAPACITY, quantiles=QS_QUANTILES
) -> DataFrame:
    """Per-event-type quantiles of ``value`` from a bounded-memory mergeable
    summary — the quantile member of the sketch family (KMV/HLL count
    distinct, Misra-Gries counts heavy keys, this ranks): a full sort at
    100 TB is a global shuffle; the summary shuffles ≤ ``capacity`` weighted
    points per (partition, group).

    Per partition+group, ``mapInPandas`` folds Arrow batches into at most
    ``4*capacity`` (value, weight) points, compacting by CUM-PRESERVING
    sampling: kept points' cumulative weights equal their ORIGINAL
    cumulative weights, so each kept point's upper rank inside its
    partition stays EXACT through any number of compaction rounds, and the
    only uncertainty is the gap to the previous kept point. The global
    estimate for quantile q is the first merged point whose cumulative
    weight reaches ``ceil(q*n)``; its true rank is off by at most
    ``err_bound = Σ_p (max_gap_p - 1)`` — a deterministic certificate
    carried in the output, same contract as the Misra-Gries sketch above.

    With ``capacity`` >= partition rows nothing compacts, every gap is 1,
    ``err_bound`` is 0 and the output is the exact rank-``ceil(q*n)``
    element — what the pytest oracle checks at the test scale factors; the
    bounded-capacity certificate is property-tested separately.
    """
    import numpy as np
    import pandas as pd
    from pyspark import TaskContext

    from artan_spark.streaming.quantiles import _compress

    capacity = int(capacity)
    if capacity <= 0:
        raise ValueError(f"capacity must be > 0, got {capacity}")
    quantiles = tuple(float(q) for q in quantiles)
    if not quantiles or any(not (0.0 < q <= 1.0) for q in quantiles):
        raise ValueError(f"quantiles must be in (0, 1], got {quantiles}")

    def compress(vals, wts):
        return _compress(vals, wts, capacity)

    def summarize(batches):
        store: dict = {}
        for pdf in batches:
            for et, grp in pdf.groupby("event_type"):
                v = grp["value"].to_numpy(dtype=float)
                w = np.ones(len(v), dtype=np.int64)
                if et in store:
                    v = np.concatenate([store[et][0], v])
                    w = np.concatenate([store[et][1], w])
                if len(v) > 4 * capacity:
                    v, w = compress(v, w)
                store[et] = (v, w)
        pid = TaskContext.get().partitionId()
        frames = []
        for et, (v, w) in store.items():
            frames.append(
                pd.DataFrame(
                    {
                        "pid": pid,
                        "event_type": et,
                        "value": v,
                        "weight": w,
                        "gap": int(w.max()),
                    }
                )
            )
        empty = pd.DataFrame(
            {"pid": [], "event_type": [], "value": [], "weight": [], "gap": []}
        ).astype({"pid": "int64", "event_type": "object", "value": "float64", "weight": "int64", "gap": "int64"})
        yield pd.concat(frames) if frames else empty

    ev = read_table(spark, sf_dir, "events")
    # the summary is tiny (<= 4*capacity points per partition-group) but
    # feeds three subtrees (totals, error bound, cumulative window) — one
    # materialization instead of three full summarize passes over the corpus
    summ = ev.select("event_type", "value").mapInPandas(
        summarize, "pid int, event_type string, value double, weight long, gap long"
    ).localCheckpoint()
    n = summ.groupBy("event_type").agg(F.sum("weight").alias("n"))
    err = (
        summ.select("pid", "event_type", "gap")
        .distinct()
        .groupBy("event_type")
        .agg(F.sum(F.col("gap") - 1).cast("long").alias("err_bound"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = summ.withColumn("cum", F.sum("weight").over(wc))
    qs = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    return (
        cum.join(F.broadcast(qs))
        .join(F.broadcast(n), "event_type")
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("event_type", "q")
        .agg(F.min("value").alias("est"))
        .join(F.broadcast(err), "event_type")
        .select("event_type", "q", "est", "err_bound")
    )


_QS_SQL = f"""
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
qs AS (SELECT unnest([{", ".join(str(q) for q in QS_QUANTILES)}]) AS q)
SELECT r.event_type, qs.q AS q, MIN(r.value) AS est, CAST(0 AS BIGINT) AS err_bound
FROM r JOIN qs ON r.rn >= CEIL(qs.q * r.n)
GROUP BY 1, 2
"""


def events_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register-wise MAX merge of the per-type HLL sketches into ONE
    global distinct-user estimate — the mergeability that makes HLL a
    rollup-able cube metric: the merge touches only 5 x 64 register rows,
    never the raw data, and is exact with respect to the sketch (merging
    sketches == sketching the union). Output also carries the global
    exact count and the naive per-type SUM of exacts, so the report
    shows what the union saves (users appear in several types; summing
    per-type counts overcounts). Same determinism contract as
    ``events_hll_distinct`` (integer registers, scaled-integer sum, 4dp
    round on the one transcendental)."""
    e = read_table(spark, sf_dir, "events")
    h = e.select("event_type", _portable_hash(F.col("user_id")).alias("hv")).distinct()
    w = F.col("hv").bitwiseAND(F.lit((1 << 54) - 1))
    rank = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    regs = (
        h.select("event_type", F.shiftright("hv", 54).alias("bucket"), rank.alias("r"))
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m"))
    )
    merged = regs.groupBy("bucket").agg(F.max("m").alias("m"))
    g = merged.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")).alias("sum_scaled"),
        F.count(F.lit(1)).alias("n_present"),
    )
    sum_scaled = F.col("sum_scaled") + (F.lit(M_REG) - F.col("n_present")) * F.lit(1 << 55)
    e_raw = F.lit(_ALPHA_64 * M_REG * M_REG) / (sum_scaled.cast("double") / F.lit(float(1 << 55)))
    v = F.lit(M_REG) - F.col("n_present")
    est = F.when(
        (e_raw <= F.lit(2.5 * M_REG)) & (v > 0),
        F.lit(float(M_REG)) * F.log(F.lit(float(M_REG)) / v.cast("double")),
    ).otherwise(e_raw)
    exact = e.agg(F.countDistinct("user_id").cast("long").alias("n_exact_global"))
    naive = (
        e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("c"))
        .agg(F.sum("c").cast("long").alias("naive_type_sum"))
    )
    return (
        g.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(naive))
        .select("n_exact_global", "naive_type_sum", F.round(est, 4).alias("hll_union_estimate"))
    )


_HLL_UNION_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
regs AS (
  SELECT event_type, hv >> 54 AS bucket,
         MAX(CASE WHEN (hv & {(1 << 54) - 1}) = 0 THEN 55
                  ELSE 55 - length(bin(hv & {(1 << 54) - 1})) END) AS m
  FROM h GROUP BY 1, 2
),
merged AS (SELECT bucket, MAX(m) AS m FROM regs GROUP BY bucket),
g AS (
  SELECT SUM(CAST(1 AS BIGINT) << (55 - m)) AS sum_scaled, COUNT(*) AS n_present
  FROM merged
),
est AS (
  SELECT CASE
           WHEN ({_ALPHA_64 * M_REG * M_REG} / ((sum_scaled + ({M_REG} - n_present) * {1 << 55}) / {float(1 << 55)})) <= {2.5 * M_REG}
                AND ({M_REG} - n_present) > 0
           THEN {float(M_REG)} * ln({float(M_REG)} / ({M_REG} - n_present))
           ELSE {_ALPHA_64 * M_REG * M_REG} / ((sum_scaled + ({M_REG} - n_present) * {1 << 55}) / {float(1 << 55)})
         END AS est
  FROM g
)
SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS n_exact_global,
       (SELECT CAST(SUM(c) AS BIGINT) FROM (SELECT COUNT(DISTINCT user_id) AS c FROM events GROUP BY event_type)) AS naive_type_sum,
       ROUND(est, 4) AS hll_union_estimate
FROM est
"""


def events_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation estimates from MERGED KMV sketches — the theta-sketch
    trick (Dasgupta et al. 2016; Beyer et al. 2007 for KMV): for every
    pair of event types, estimate the user-set overlap WITHOUT comparing
    the sets — only their k-minimum-value sketches meet.

    Per pair (A, B): take the K smallest hashes of the sketch UNION;
    theta = their max; union_est = (K-1)/(theta/2^60) (the KMV estimator
    on the union sketch); jaccard_est = fraction of those K that appear
    in BOTH sketches; inter_est = jaccard_est * union_est. Everything
    derives from the same portable md5 integers, so the oracle checks the
    ESTIMATES bit-exactly (integer counts + one IEEE division each) —
    exact counts ride along for the error report.

    100-TB shape: ONE distinct agg over the corpus builds the per-type
    sketches (K rows each); every pair computation happens on K-row
    frames — sketches are the only thing that meets, never the sets."""
    e = read_table(spark, sf_dir, "events")
    h = e.select("event_type", _portable_hash(F.col("user_id")).alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    sk = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= K).select(
        "event_type", "hv"
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    # per-pair union of the two sketches, flagged by membership side
    su = (
        pairs.join(
            F.broadcast(sk),
            (F.col("event_type") == F.col("ta")) | (F.col("event_type") == F.col("tb")),
        )
        .groupBy("ta", "tb", "hv")
        .agg(
            F.max((F.col("event_type") == F.col("ta")).cast("int")).alias("in_a"),
            F.max((F.col("event_type") == F.col("tb")).cast("int")).alias("in_b"),
        )
    )
    wu = Window.partitionBy("ta", "tb").orderBy("hv")
    topk = su.withColumn("rn", F.row_number().over(wu)).filter(F.col("rn") <= K)
    agg = topk.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("kk"),
        F.max("hv").alias("theta"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("c_both"),
    )
    union_est = F.when(
        F.col("kk") < K, F.col("kk").cast("double")
    ).otherwise(F.lit(float(K - 1)) / (F.col("theta") / F.lit(_TWO60)))
    jac = F.col("c_both").cast("double") / F.col("kk")
    return agg.select(
        "ta",
        "tb",
        F.round(jac, 6).alias("jaccard_est"),
        F.round(union_est, 6).alias("union_est"),
        F.round(jac * union_est, 6).alias("inter_est"),
    )


_KMV_OVERLAP_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
sk AS (
  SELECT event_type, hv
  FROM (SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn FROM h)
  WHERE rn <= {K}
),
types AS (SELECT DISTINCT event_type FROM sk),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a CROSS JOIN types b WHERE a.event_type < b.event_type
),
su AS (
  SELECT p.ta, p.tb, s.hv,
         MAX(CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
  GROUP BY p.ta, p.tb, s.hv
),
topk AS (
  SELECT * FROM (
    SELECT ta, tb, hv, in_a, in_b,
           ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
    FROM su
  ) WHERE rn <= {K}
),
agg AS (
  SELECT ta, tb, COUNT(*) AS kk, MAX(hv) AS theta,
         SUM(in_a * in_b) AS c_both
  FROM topk GROUP BY ta, tb
)
SELECT ta, tb,
       ROUND(CAST(c_both AS DOUBLE) / kk, 6) AS jaccard_est,
       ROUND(CASE WHEN kk < {K} THEN CAST(kk AS DOUBLE)
                  ELSE {float(K - 1)} / (theta / {_TWO60}) END, 6) AS union_est,
       ROUND((CAST(c_both AS DOUBLE) / kk)
             * (CASE WHEN kk < {K} THEN CAST(kk AS DOUBLE)
                     ELSE {float(K - 1)} / (theta / {_TWO60}) END), 6) AS inter_est
FROM agg
"""


# -- Count-Min Sketch ---------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPN = 10


def _cms_col(j: int, key, width: int):
    """Row-j column index: portable 60-bit md5 of 'j:key' mod width —
    nonnegative, so Spark pmod == DuckDB %."""
    return F.pmod(
        _portable_hash(F.concat(F.lit(f"{j}:"), key.cast("string"))), F.lit(width)
    )


def cms_build(d: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) over ``key_col``:
    returns the (j, col, cnt) cell table, ``depth x width`` rows TOTAL
    regardless of corpus size. The build is one explode (depth structs
    per row, in-row) + one groupBy — partial aggregation IS the sketch's
    mergeability, so the shuffle carries at most depth*width rows per
    map task. Estimates are deterministic (md5-derived columns), hence
    bit-exact cross-engine."""
    jc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), _cms_col(j, F.col(key_col), width).alias("col")
                )
                for j in range(depth)
            ]
        )
    )
    return (
        d.select(jc.alias("jc"))
        .select(F.col("jc.j").alias("j"), F.col("jc.col").alias("col"))
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(cells: DataFrame, keys: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate each key in ``keys`` against a ``cms_build`` cell
    table: est(key) = min_j cells[j, h_j(key)] — the classic one-sided
    estimate (est >= true count always; over-count bounded by eps*N with
    probability 1-delta for width=e/eps, depth=ln(1/delta)). The keys
    frame is tiny (a report/probe set): both sides of the lookup join
    broadcast."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _cms_col(j, F.col(key_col), width).alias("col"))
                    for j in range(depth)
                ]
            )
        ).alias("jc"),
    ).select(key_col, F.col("jc.j").alias("j"), F.col("jc.col").alias("col"))
    return (
        probes.join(F.broadcast(cells), ["j", "col"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )


def events_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS frequency estimates for the true top-``CMS_TOPN`` users by
    event count, next to the exact counts — the estimate is deterministic
    so the oracle checks it to the last bit, and ``est >= exact`` is the
    sketch's certificate (asserted in tests for EVERY key, not just the
    top). 100-TB shape: the sketch build shuffles at most depth*width
    rows per map task (map-side combine over a fixed key space); the
    exact-count agg here exists only to report the error and is NOT part
    of the sketch path."""
    e = read_table(spark, sf_dir, "events").select("user_id")
    cells = cms_build(e, "user_id")
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    topk = exact.orderBy(F.desc("n_exact"), F.asc("user_id")).limit(CMS_TOPN)
    est = cms_estimate(cells, topk.select("user_id"), "user_id")
    return topk.join(est, "user_id").select("user_id", "n_exact", "cms_estimate")


_CMS_SQL = f"""
WITH j AS (SELECT unnest(range({CMS_DEPTH})) AS j),
cells AS (
  SELECT j.j,
         CAST('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)), 1, 15) AS BIGINT) % {CMS_WIDTH} AS col,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events e CROSS JOIN j
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM events GROUP BY 1
),
topk AS (
  SELECT user_id, n_exact FROM exact ORDER BY n_exact DESC, user_id ASC LIMIT {CMS_TOPN}
),
probes AS (
  SELECT t.user_id, j.j,
         CAST('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)), 1, 15) AS BIGINT) % {CMS_WIDTH} AS col
  FROM topk t CROSS JOIN j
)
SELECT t.user_id, t.n_exact, CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate
FROM topk t JOIN probes p ON p.user_id = t.user_id
JOIN cells c ON c.j = p.j AND c.col = p.col
GROUP BY 1, 2
"""


QUERIES = {"events_kmv_distinct": events_kmv_distinct}
ORACLES = {"events_kmv_distinct": _KMV_SQL}

# registry is capped at the driver's 50-entry window; the HLL sketch is
# oracle-checked in pytest (tests/test_oracle.py) like the other folded
# queries
PYTEST_ORACLES = {
    "events_cms_topk": (events_cms_topk, _CMS_SQL),
    "events_kmv_overlap": (events_kmv_overlap, _KMV_OVERLAP_SQL),
    "events_hll_union": (events_hll_union, _HLL_UNION_SQL),
    "events_hll_distinct": (events_hll_distinct, _HLL_SQL),
    "events_heavy_hitters": (events_heavy_hitters, _HH_SQL),
    "events_quantile_sketch": (events_quantile_sketch, _QS_SQL),
}
