"""Generic table profiler — per-column null counts, distinct cardinality,
and min/max — the first pass you run over an unfamiliar 100-TB lake before
trusting any downstream query (partition-key choice, skew risk, null
contracts all read straight off it).

Output is long format, one row per column:
``(column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)``
— numeric and timestamp columns fill ``min_num``/``max_num`` (timestamps as
epoch seconds, the portable representation both engines compute
identically from microsecond integers), string columns fill
``min_str``/``max_str`` (binary collation in both engines).

Scale design:
- ``exact=True`` (the oracle path) computes every per-column aggregate in
  ONE pass; Spark rewrites the multi-column COUNT(DISTINCT) with an Expand
  (shuffle volume x(k+1) for k distinct aggs) — exact, but the expansion is
  the price of exactness;
- ``exact=False`` swaps COUNT(DISTINCT) for HLL ``approx_count_distinct``
  (default 5% rsd): partial-aggregable, NO expand, one map-side pass — the
  100-TB default. A test pins the approx path within HLL error of exact.
- the long format comes from one ``stack`` over the single aggregate row —
  a 1-row driver-side pivot, never a per-column scan.

The reference engine (ozancicek/artan) has no counterpart; beyond-reference
surface (the SURVEY §2 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType, TimestampType

from artan_spark.sources import read_table


def profile_table(df: DataFrame, exact: bool = True) -> DataFrame:
    """Long-format per-column profile of any DataFrame (see module doc).
    Columns of unsupported types (arrays, structs, binary) profile nulls
    and distincts but leave min/max NULL."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    per_col: list[tuple[str, str]] = []
    for f in df.schema.fields:
        c, s = F.col(f.name), f.name
        aggs.append(F.count(c).alias(f"nn_{s}"))  # non-null count
        if exact:
            aggs.append(F.countDistinct(c).alias(f"nd_{s}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"nd_{s}"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).cast("double").alias(f"mn_{s}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{s}"))
            kind = "num"
        elif isinstance(f.dataType, TimestampType):
            aggs.append(F.min(c).cast("double").alias(f"mn_{s}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{s}"))
            kind = "num"
        elif isinstance(f.dataType, StringType):
            aggs.append(F.min(c).alias(f"mn_{s}"))
            aggs.append(F.max(c).alias(f"mx_{s}"))
            kind = "str"
        else:
            kind = "none"
        per_col.append((s, kind))

    one = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    stacked = []
    for s, kind in per_col:
        mn_num = F.col(f"mn_{s}") if kind == "num" else null_d
        mx_num = F.col(f"mx_{s}") if kind == "num" else null_d
        mn_str = F.col(f"mn_{s}") if kind == "str" else null_s
        mx_str = F.col(f"mx_{s}") if kind == "str" else null_s
        stacked.append(
            F.struct(
                F.lit(s).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"nn_{s}")).alias("n_nulls"),
                F.col(f"nd_{s}").cast("long").alias("n_distinct"),
                mn_num.alias("min_num"),
                mx_num.alias("max_num"),
                mn_str.alias("min_str"),
                mx_str.alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*stacked)).alias("p")).select("p.*")


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact profile of the events table (6 columns, one pass)."""
    return profile_table(read_table(spark, sf_dir, "events"), exact=True)


def _profile_col_sql(col: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
        ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn = f"CAST(extract(epoch FROM MIN({col})) AS DOUBLE)"
        mx = f"CAST(extract(epoch FROM MAX({col})) AS DOUBLE)"
        ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    else:
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        ms, xs = f"MIN({col})", f"MAX({col})"
    return f"""
SELECT '{col}' AS column, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({col}) AS n_nulls,
       COUNT(DISTINCT {col}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num, {ms} AS min_str, {xs} AS max_str
FROM events"""


_EVENTS_PROFILE_SQL = " UNION ALL ".join(
    _profile_col_sql(c, k)
    for c, k in [
        ("event_id", "num"),
        ("ts", "ts"),
        ("user_id", "num"),
        ("event_type", "str"),
        ("value", "num"),
        ("props", "str"),
    ]
)


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {
    "events_profile": (events_profile, _EVENTS_PROFILE_SQL),
}
NO_SQL_QUERIES: dict = {}
