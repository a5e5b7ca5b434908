"""Z-order (Morton) clustering for lake layout: interleave the bits of two
quantized columns so that sorting/bucketing by ONE key gives file-level
min/max locality in BOTH dimensions — the technique behind Delta/Iceberg's
``OPTIMIZE ZORDER BY`` (public: Morton 1966; the Delta docs describe the
same bit-interleave). A lake laid out this way lets parquet row-group
min/max statistics prune scans filtered on EITHER column, where a plain
sort prunes only its leading column.

Everything is integer bit arithmetic over range-quantized values (the
min/max come from one 1-row broadcast aggregate; the quantization divides
identical operands in both engines), so the DuckDB oracle is exact and the
layout is reproducible across engines and partitionings.

100-TB shape: the zkey is a stateless per-row projection (the only
non-projection work is the 1-row min/max agg, broadcast back); writing
``repartition(bucket)`` + per-file stats is then the standard clustered
write. No global sort — the bucket grid IS the order.

The reference engine (ozancicek/artan) has no counterpart;
beyond-reference lake-layout surface next to the training export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.sources import read_table

Q_BITS = 8  # per-dimension quantization (256 cells)
TILE_BITS = 3  # bucket = top TILE_BITS of each dimension -> 8x8 = 64 tiles


def _quantize(col: F.Column, mn: F.Column, mx: F.Column, bits: int = Q_BITS) -> F.Column:
    """Range-quantize to [0, 2^bits): identical-operand division + floor,
    exact cross-engine; the max value clamps into the last cell. A
    degenerate range (constant column, mx == mn) maps every row to cell 0
    — without the guard 0/0 is NaN in Spark and engine-divergent in
    DuckDB, poisoning the zkey."""
    cells = float(1 << bits)
    q = F.floor(
        (col.cast("double") - mn) / (mx - mn) * F.lit(cells)
    ).cast("int")
    clamped = F.least(F.greatest(q, F.lit(0)), F.lit((1 << bits) - 1))
    return F.when(mx == mn, F.lit(0)).otherwise(clamped)


def _interleave(qx: F.Column, qy: F.Column, bits: int = Q_BITS) -> F.Column:
    """Morton key: x bits at odd positions, y bits at even — built as a
    compile-time chain of shift/and/or terms (whole-stage codegen)."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i + 1))
            .bitwiseOR(F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i))
        )
    return z


def _interleave_sql(qx: str, qy: str, bits: int = Q_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({qx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qy} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def zorder_keys(df: DataFrame, xcol: str, ycol: str) -> DataFrame:
    """df + (zkey, zbucket): the Morton key of the two range-quantized
    columns and its top-tile bucket (an 8x8 grid). One 1-row min/max
    aggregate broadcast back; the key itself is a pure projection."""
    rng = df.agg(
        F.min(F.col(xcol).cast("double")).alias("mnx"),
        F.max(F.col(xcol).cast("double")).alias("mxx"),
        F.min(F.col(ycol).cast("double")).alias("mny"),
        F.max(F.col(ycol).cast("double")).alias("mxy"),
    )
    qx = _quantize(F.col(xcol), F.col("mnx"), F.col("mxx"))
    qy = _quantize(F.col(ycol), F.col("mny"), F.col("mxy"))
    z = _interleave(qx, qy)
    return (
        df.join(F.broadcast(rng))
        .withColumn("zkey", z)
        .withColumn("zbucket", F.shiftright(F.col("zkey"), 2 * (Q_BITS - TILE_BITS)))
        .drop("mnx", "mxx", "mny", "mxy")
    )


def cluster_by_zorder(df: DataFrame, xcol: str, ycol: str, out_dir: str) -> None:
    """Materialize the clustered layout: one zkey-sorted file per z-tile.
    Parquet footer min/max stats on xcol AND ycol are then tile-narrow, so
    a predicate on either column prunes ~7/8 of the files."""
    (
        zorder_keys(df, xcol, ycol)
        .repartition(1 << (2 * TILE_BITS), F.col("zbucket"))
        .sortWithinPartitions("zbucket", "zkey")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(out_dir)
    )


def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: the (user_id, value) z-tile layout manifest of
    ``events`` — per-tile row counts and BOTH dimensions' min/max (the
    ranges a parquet footer would carry; their narrowness is the pruning
    argument, asserted in tests)."""
    z = zorder_keys(read_table(spark, sf_dir, "events"), "user_id", "value")
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def _zorder_layout_sql() -> str:
    cells = float(1 << Q_BITS)
    hi = (1 << Q_BITS) - 1
    qx = (
        f"CASE WHEN mxx = mnx THEN 0 ELSE "
        f"LEAST(GREATEST(CAST(FLOOR((CAST(user_id AS DOUBLE) - mnx) / (mxx - mnx) * {cells}) "
        f"AS INT), 0), {hi}) END"
    )
    qy = (
        f"CASE WHEN mxy = mny THEN 0 ELSE "
        f"LEAST(GREATEST(CAST(FLOOR((value - mny) / (mxy - mny) * {cells}) "
        f"AS INT), 0), {hi}) END"
    )
    return f"""
WITH rng AS (
  SELECT MIN(CAST(user_id AS DOUBLE)) AS mnx, MAX(CAST(user_id AS DOUBLE)) AS mxx,
         MIN(value) AS mny, MAX(value) AS mxy
  FROM events
),
q AS (
  SELECT user_id, value, {qx} AS qx, {qy} AS qy FROM events, rng
),
z AS (
  SELECT user_id, value,
         ({_interleave_sql('qx', 'qy')}) >> {2 * (Q_BITS - TILE_BITS)} AS zbucket
  FROM q
)
SELECT zbucket, COUNT(*) AS n_rows,
       MIN(user_id) AS min_user, MAX(user_id) AS max_user,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM z GROUP BY zbucket
"""


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES = {"events_zorder_layout": (events_zorder_layout, _zorder_layout_sql())}
