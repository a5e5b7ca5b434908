"""Sink coverage: partitioned parquet round-trip with partition pruning,
and bucketed tables joining without an exchange."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from artan_spark.sources import read_table, write_bucketed_table, write_table

from conftest import SF_DIR


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes(spark, tmp_path):
    e = read_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_by_type")
    write_table(e, out, partition_by="event_type")

    back = spark.read.parquet(out)
    assert back.count() == e.count()

    one = back.filter(F.col("event_type") == "purchase")
    assert one.count() == e.filter(F.col("event_type") == "purchase").count()
    # the partition filter must reach the scan, not run as a post-filter
    assert "PartitionFilters: [isnotnull(event_type" in _plan(one)


def test_bucketed_join_no_exchange(spark):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped in the finally block
    e = read_table(spark, SF_DIR, "events")
    facts = e.select("event_id", "user_id", "value")
    dims = e.groupBy("user_id").agg(F.avg("value").alias("avg_value"))
    write_bucketed_table(facts, "t_facts", bucket_by="user_id", n_buckets=4)
    write_bucketed_table(dims, "t_dims", bucket_by="user_id", n_buckets=4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        j = spark.table("t_facts").join(spark.table("t_dims"), "user_id")
        n = j.count()
        assert n == facts.count()
        plan = _plan(j)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-bucketed scan: the join must not re-shuffle either side
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_facts")
        spark.sql("DROP TABLE IF EXISTS t_dims")
