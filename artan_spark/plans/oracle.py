"""Local mirror of the driver's correctness gate: run a plan's Spark query
and its DuckDB oracle side-by-side and compare row count, column names, and
order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from artan_spark.sources import TABLES


def duckdb_frame(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.sql(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype(float)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(list(out.columns), kind="stable").reset_index(drop=True)


def compare(spark, query_fn, oracle_sql: str, sf_dir: str, atol: float = 0.0) -> dict:
    sdf = query_fn(spark, sf_dir).toPandas()
    ddf = duckdb_frame(oracle_sql, sf_dir)
    result = {"rows": (len(sdf), len(ddf)), "cols": (sorted(sdf.columns), sorted(ddf.columns))}
    if sorted(sdf.columns) != sorted(ddf.columns):
        result["match"] = False
        result["why"] = "column mismatch"
        return result
    if len(sdf) != len(ddf):
        result["match"] = False
        result["why"] = "row count mismatch"
        return result
    a, b = _normalize(sdf), _normalize(ddf)
    mismatches = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~(
                (av.isna() & bv.isna())
                | ((av - bv).abs() <= atol + 1e-12 * bv.abs().fillna(0.0))
            )
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        if bad.any():
            i = bad.idxmax()
            mismatches.append((c, int(bad.sum()), av.iloc[i] if i in av.index else None, bv.iloc[i] if i in bv.index else None))
    result["match"] = not mismatches
    if mismatches:
        result["why"] = f"value mismatch: {mismatches[:3]}"
    return result


def exact_hash(df: pd.DataFrame) -> str:
    """The strictest stand-in for the driver's value hash."""
    import hashlib

    n = _normalize(df)
    payload = n.to_csv(index=False, float_format="%.12g").encode()
    return hashlib.sha256(payload).hexdigest()
