"""as-of join semantics on hand-built frames + plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from artan_spark.plans.temporal import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(1), "a"),   # before any right row -> null
            ("u1", _ts(5), "b"),   # exactly at right row ts=5 -> inclusive match
            ("u1", _ts(9), "c"),   # between 5 and 10 -> matches 5
            ("u1", _ts(12), "d"),  # after 10 -> matches 10
            ("u2", _ts(7), "e"),   # other group, own right rows
            ("u3", _ts(3), "f"),   # group with no right rows -> null
        ],
        "user string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 50.0),
            ("u1", _ts(10), 100.0),
            ("u2", _ts(6), 60.0),
        ],
        "user string, ts timestamp, px double",
    )
    out = asof_join(left, right, on="ts", by="user", payload=["px"])
    got = {r["tag"]: r["px"] for r in out.collect()}
    assert got == {"a": None, "b": 50.0, "c": 50.0, "d": 100.0, "e": 60.0, "f": None}


def test_asof_join_single_shuffle(spark):
    left = spark.range(10).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts"), F.lit(1.0).alias("v")
    )
    right = spark.range(5).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts"), F.lit(2.0).alias("p")
    )
    plan = asof_join(left, right, on="ts", by="k", payload=["p"])._jdf.queryExecution().executedPlan().toString()
    # one hash exchange for the window partitioning; the union itself must
    # not introduce extra exchanges
    assert plan.count("Exchange hashpartitioning") == 1, plan
